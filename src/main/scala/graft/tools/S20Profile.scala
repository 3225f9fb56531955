package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.StreamingQueries
import org.apache.spark.sql.functions._

/** s20 wall-clock decomposition (r16 verdict "Next round" #6): the
  * query's ~8 s cold median is 2nd-heaviest in the sweep; the open
  * question is what it buys — file-stream listing/checkpoint
  * machinery, the staging writes, or the standing-index parquet
  * re-read per batch (the cost a band_key-bucketed index would
  * prune). This replays the registered query's EXACT steps (same
  * dirs, same admission builder, same 8 shuffle partitions) with a
  * timer around each phase:
  *
  *   stage     — 3 slice writes + 2 empty-state writes
  *   b<k>.copy — file copy into the source dir
  *   b<k>.proc — processAllAvailable (further split inside admit:
  *               adm = admission + out write, st = state appends)
  *   final     — result read + localCheckpoint
  *
  * Run: sbt "runMain graft.tools.S20Profile [sfDir]"
  * Findings land in docs/PLANS.md ("Round 17: s20 decomposition").
  */
object S20Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val s = GraftSession.build("graft-s20-profile")
    s.sparkContext.setLogLevel("WARN")
    // rep 1 carries the fresh-JVM JIT/codegen debt; read rep 2+ for
    // the steady-state phase shape (the regime BenchOne's min-of-3
    // reports)
    (1 to reps).foreach { rep =>
      runOnce(s, dir, rep)
      GraftSession.dropAllBlocks(s)
      System.gc()
    }
    s.stop()
  }

  private def runOnce(
      s: org.apache.spark.sql.SparkSession, dir: String, rep: Int): Unit = {
    val D = graft.operators.Dedup
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(
        f"S20PROFILE r$rep $label%-10s ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("graft_s20p_").toFile
    def sub(n: String) = new java.io.File(base, n)
    val in = sub("in"); in.mkdirs()
    val stage = sub("stage")
    val idxDir = sub("index").getAbsolutePath
    val shDir = sub("shingles").getAbsolutePath
    val outDir = sub("out").getAbsolutePath
    s.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = Tables(s, dir).documents
    timed("stage") {
      // the query's one-pass slice staging (StreamingQueries.stageSlices)
      docs.withColumn("k", pmod(col("doc_id"), lit(3)).cast("int"))
        .repartition(col("k"))
        .write.mode("overwrite").partitionBy("k")
        .parquet(stage.getAbsolutePath)
      val none = docs.filter(lit(false))
      D.portableShingles(none).write.parquet(shDir)
    }
    // the r18 bucketed band-index schema anchor (matches the query)
    val emptyBands =
      D.portableMinHashBands(D.portableShingles(docs.filter(lit(false))))
    var batchNo = -1
    val admit = (batchRaw: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        _: Long) => {
      batchNo += 1
      val batch = batchRaw.persist()
      val shN = D.portableShingles(batch).persist()
      val bandsN = D.portableMinHashBandsFromDocs(batch).persist()
      try {
        timed(s"b$batchNo.adm") {
          // the query's bucket-pruned index probe, step for step
          val idxProbed = D.readProbedBuckets(s, idxDir,
            bandsN.select(col("band_key")), emptyBands)
          val (_, _, _, admitted) = StreamingQueries.Frames
            .s20Admission(batch, shN, bandsN, idxProbed,
              s.read.parquet(shDir))
          admitted
            .select(pmod(col("doc_id"), lit(3)).cast("int").as("batch_no"),
              col("doc_id"))
            .write.mode("append").parquet(outDir)
        }
        timed(s"b$batchNo.st") {
          val admIds = s.read.parquet(outDir)
            .join(batch.select(col("doc_id")), Seq("doc_id"), "left_semi")
            .select(col("doc_id"))
          shN.join(admIds, Seq("doc_id"), "left_semi")
            .write.mode("append").parquet(shDir)
          D.appendBucketed(
            bandsN.join(admIds, Seq("doc_id"), "left_semi"), idxDir,
            "band_key")
        }
      } finally { bandsN.unpersist(); shN.unpersist(); batch.unpersist(); () }
    }
    val q = s.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(in.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", sub("ckpt").getAbsolutePath)
      .foreachBatch(admit)
      .start()
    (0 to 2).foreach { k =>
      timed(s"b$k.copy") {
        new java.io.File(stage, s"k=$k").listFiles()
          .filter(_.getName.endsWith(".parquet")).foreach { f =>
            java.nio.file.Files.copy(f.toPath,
              new java.io.File(in, s"b$k-${f.getName}").toPath)
          }
      }
      timed(s"b$k.proc")(q.processAllAvailable())
    }
    q.stop()
    timed("final")(s.read.parquet(outDir).orderBy("doc_id").localCheckpoint())
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
    }
    rmTree(base)
  }
}
