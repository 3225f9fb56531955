package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Retention/GC semantics of the versioned model-artifact store — the
  * failure modes the n127 in-query requires don't cover: pruning
  * bounds, the never-written pinned read, idempotence, and that
  * loadLatest keeps serving across a prune.
  */
class ArtifactRetentionSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  private val M = graft.operators.ModelArtifacts

  private var base: java.io.File = _
  override def beforeAll(): Unit = {
    super.beforeAll()
    base = java.nio.file.Files.createTempDirectory("graft_retention_").toFile
  }
  override def afterAll(): Unit = {
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree))
      f.delete(); ()
    }
    rmTree(base)
    super.afterAll()
  }

  private def freshStore(name: String, versions: Int*): String = {
    val dir = new java.io.File(base, name).getAbsolutePath
    versions.foreach { v =>
      M.writeVersion(
        spark.range(1).select(lit(s"model_v$v").as("payload")), dir, v)
    }
    dir
  }

  test("pruneVersions keeps exactly the newest K and reports the drops") {
    val dir = freshStore("prune3", 1, 2, 3, 4)
    assert(M.pruneVersions(spark, dir, keepLatestK = 2) == Seq(1, 2))
    assert(M.listVersions(spark, dir) == Seq(3, 4))
    // idempotent: nothing left to drop at the same K
    assert(M.pruneVersions(spark, dir, keepLatestK = 2) == Seq.empty)
    // K beyond the population drops nothing
    assert(M.pruneVersions(spark, dir, keepLatestK = 10) == Seq.empty)
    assert(M.listVersions(spark, dir) == Seq(3, 4))
  }

  test("loadLatest keeps serving the surviving newest version across a prune") {
    val dir = freshStore("latest", 1, 2)
    M.pruneVersions(spark, dir, keepLatestK = 1)
    val r = M.loadLatest(spark, dir).select("payload", "version").head()
    assert((r.getString(0), r.getInt(1)) == ("model_v2", 2))
  }

  test("a pinned read of a pruned version fails loudly, naming the survivors") {
    val dir = freshStore("pinned", 1, 2, 3)
    M.pruneVersions(spark, dir, keepLatestK = 2)
    val e = intercept[IllegalArgumentException](M.loadVersion(spark, dir, 1))
    assert(e.getMessage.contains("version 1") &&
      e.getMessage.contains("2, 3"),
      s"failure must name the missing version and survivors: ${e.getMessage}")
    // the surviving pin still reads clean
    assert(M.loadVersion(spark, dir, 2).count() == 1L)
  }

  test("a pinned read of a never-written version fails the same way") {
    val dir = freshStore("never", 1)
    intercept[IllegalArgumentException](M.loadVersion(spark, dir, 7))
  }

  test("retention racing a RUNNING stream: loaded model keeps serving; a restart re-resolves latest") {
    // The production race n127's batch-side proof doesn't cover: a
    // streaming gate resolved latest (v2) at stream start, then a
    // retrain writes v3 and retention prunes v2 MID-STREAM. Defined
    // behavior (the s34 apply-side contract): the gate collected the
    // model-sized frame to the driver at start, so every later
    // micro-batch keeps scoring with the LOADED v2 — no disk
    // dependency survives the load; only a RESTART re-resolves
    // latest, and a reader that pinned the pruned version fails
    // loudly at loadVersion rather than silently serving nothing.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sql = spark.sqlContext
    val dir = new java.io.File(base, "race").getAbsolutePath
    def floors(thr: Long) = Seq(("src0", thr)).toDF("source", "thr_tok")
    M.writeVersion(floors(10L), dir, 1)
    M.writeVersion(floors(20L), dir, 2)
    // the s34 pattern: resolve latest ONCE, collect (model-sized)
    val loaded = M.loadLatest(spark, dir)
      .select("source", "thr_tok", "version").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(loaded.map(_._3) == Seq(2), s"expected to load v2: $loaded")
    val model = loaded.toDF("source", "thr_tok", "version")
    val input = MemoryStream[(String, Long)]
    val gated = input.toDF().toDF("source", "n_tok")
      .join(broadcast(model), Seq("source"), "left")
      .filter(col("n_tok") >= col("thr_tok"))
      .select("source", "n_tok", "version")
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("retention_race").start()
    try {
      input.addData(("src0", 15L), ("src0", 25L))
      q.processAllAvailable()
      // the race: retrain lands v3, retention prunes the SERVED v2
      M.writeVersion(floors(30L), dir, 3)
      assert(M.pruneVersions(spark, dir, keepLatestK = 1) == Seq(1, 2))
      input.addData(("src0", 15L), ("src0", 25L), ("src0", 35L))
      q.processAllAvailable()
    } finally q.stop()
    val sink = spark.table("retention_race")
    // batch 2 kept scoring with the LOADED v2 threshold (20): the 25
    // and 35 pass, the 15 drops — v3's 30-floor would have dropped 25
    assert(sink.filter(col("version") === 2).count() == sink.count())
    val batch2 = sink.select("n_tok").collect().map(_.getLong(0)).sorted
    assert(batch2.toSeq == Seq(25L, 25L, 35L),
      s"v2 floor (20) must gate every batch: ${batch2.toSeq}")
    spark.catalog.dropTempView("retention_race")
    // a restart re-resolves latest = v3 …
    val restarted = M.loadLatest(spark, dir)
      .select("thr_tok", "version").head()
    assert((restarted.getLong(0), restarted.getInt(1)) == (30L, 3))
    // … and the pruned pin fails loudly, never silently serves nothing
    intercept[IllegalArgumentException](M.loadVersion(spark, dir, 2))
  }

  test("degenerate inputs: keepLatestK < 1 refused; empty store lists empty") {
    val dir = freshStore("degenerate", 1)
    intercept[IllegalArgumentException](
      M.pruneVersions(spark, dir, keepLatestK = 0))
    assert(M.listVersions(spark,
      new java.io.File(base, "does_not_exist").getAbsolutePath) == Seq.empty)
  }
}
