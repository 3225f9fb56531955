package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned trained-model artifacts on disk — the lifecycle half the
  * batch-train → streaming-apply pipelines (s19/s21/s23/s26–s33) were
  * missing: those train and consume frozen model state inside ONE
  * process, while a production pipeline trains in one JOB and applies
  * in another, with the model passing through a STORE that carries
  * versions. Reference capability analog: the managed-resource
  * open/close contract (`/root/reference/src/main/scala/
  * SimpleStreamProcessor/Node.scala:162-199`) — a model version is a
  * resource acquired at apply time, not ambient state.
  *
  * Retention vs a RUNNING reader (the contract ArtifactRetentionSpec's
  * mid-stream race pins): the apply side resolves a version ONCE at
  * job start and collects the model-sized frame to the driver (the
  * s34 pattern), so [[pruneVersions]] deleting that version mid-run
  * cannot affect the running job — no disk dependency survives the
  * load. Latest advances (a retrain landing v N+1 between
  * micro-batches) are likewise invisible until a RESTART re-resolves
  * [[loadLatest]]; a reader that pinned the pruned version fails
  * loudly at [[loadVersion]]'s existence check on restart. Readers
  * that keep LINEAGE to the store (no collect) would instead race the
  * delete at file-read time — which is why the apply-side queries
  * (s34/s38, n127) all collect before streaming starts.
  *
  * Layout: one parquet directory per artifact, partitioned by
  * `version=N` — so a reader of version N prunes to one partition
  * (directory-level partition pruning, no data read from other
  * versions), writers APPEND new versions without touching old ones
  * (immutable versions — the retrain job can never corrupt the one
  * being served), and the store works on any parquet filesystem at
  * any scale because a model frame is model-sized (vocab / bounds /
  * weights), not corpus-sized.
  */
object ModelArtifacts {

  /** Write `model` as version `version` of the artifact at `dir`.
    * Append-only: versions are immutable once written; re-running a
    * version is the caller's idempotence decision. The model frame is
    * coalesced to one file per version — artifacts are model-sized by
    * contract, and a single file makes the version atomic-ish on a
    * rename-capable filesystem.
    */
  def writeVersion(model: DataFrame, dir: String, version: Int): Unit =
    model.withColumn("version", lit(version))
      .coalesce(1)
      .write.mode("append").partitionBy("version").parquet(dir)

  /** Load the LATEST version from the artifact at `dir` — a FRESH disk
    * read (no lineage back to the training job; this is the apply-side
    * jobs' view). The max version is a one-row aggregate joined back
    * broadcast, never a driver collect; Spark prunes the version
    * partitions after the join filter at the file-listing level for a
    * literal and at runtime via the broadcast (dynamic partition
    * pruning) otherwise — either way the old versions' DATA is never
    * scanned into the apply plan.
    */
  def loadLatest(spark: SparkSession, dir: String): DataFrame = {
    val art = spark.read.parquet(dir)
    val latest = art.groupBy().agg(max(col("version")).as("version"))
    art.join(broadcast(latest), "version")
  }

  /** Load a PINNED version — the rollback / shadow-deployment read
    * path (serve vN while evaluating vN+1, or pin a known-good version
    * after a bad retrain). The literal filter prunes to the one
    * version partition at file-listing time; other versions' files are
    * never opened.
    *
    * FAILS LOUDLY when the pinned version is absent (pruned by
    * [[pruneVersions]], or never written): the partition filter alone
    * would return an EMPTY frame, and a serving job silently scoring
    * with zero model rows is the worst failure mode a versioned store
    * can have — a left join against empty bounds passes every row.
    * The existence check is one directory listing (metadata, never a
    * data read), through the store path's own Hadoop filesystem so it
    * holds on any parquet filesystem, not just local disk.
    */
  def loadVersion(spark: SparkSession, dir: String, version: Int): DataFrame = {
    val have = listVersions(spark, dir)
    require(have.contains(version),
      s"artifact version $version at $dir is absent " +
        s"(pruned or never written; available: ${have.mkString(", ")}) — " +
        "a pinned reader must fail loudly, not silently read nothing")
    spark.read.parquet(dir).filter(col("version") === version)
  }

  /** The versions currently present at `dir`, ascending — a directory
    * listing of the `version=N` partitions (metadata-only; version
    * data is never opened). Empty when the store doesn't exist yet.
    */
  def listVersions(spark: SparkSession, dir: String): Seq[Int] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("version="))
      .map(_.getPath.getName.stripPrefix("version=").toInt)
      .sorted
  }

  /** Retention/GC — the lifecycle step that closes the append-only
    * loop: delete every version partition EXCEPT the newest
    * `keepLatestK`, returning the versions dropped. A production store
    * cannot only grow: superseded retrains are dead weight (at model
    * cadence, hundreds of partitions a year), and an UNBOUNDED pin set
    * means a rollback target may be arbitrarily stale. Deletion is
    * per-partition directory removal through the store's filesystem —
    * versions are immutable, so there is no in-place state to corrupt,
    * and the serving read path ([[loadLatest]] / [[loadVersion]])
    * never lists a half-deleted partition as available because the
    * delete is directory-atomic per version. A pinned reader of a
    * pruned version fails loudly at [[loadVersion]]'s existence check
    * rather than silently reading latest (or nothing).
    */
  def pruneVersions(spark: SparkSession, dir: String,
      keepLatestK: Int): Seq[Int] = {
    require(keepLatestK >= 1, s"need keepLatestK >= 1, got $keepLatestK")
    val drop = listVersions(spark, dir).dropRight(keepLatestK)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    drop.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"version=$v"), true)
    }
    drop
  }
}
