package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Committed-plan evidence for the r18 bucketed standing band index
  * (plans/r18/s20_index_probe_bucketed.txt): stages a B-bucketed index
  * from the corpus, probes it with a micro-batch through the shipped
  * `readProbedBuckets` path, and prints the EXECUTED probe plan — the
  * scan's Location must list only the probed bucket directories, which
  * is the "per-batch probe reads only the probed buckets" claim in
  * checkable form (the BucketedStateSpec pins the same property at
  * suite speed).
  * Run: sbt "runMain graft.tools.S20BucketPlan [sfDir] [buckets]"
  */
object S20BucketPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val buckets = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = GraftSession.build("graft-s20-bucket-plan")
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files
      .createTempDirectory("graft_s20plan_").toFile
    val idxDir = new java.io.File(base, "index").getAbsolutePath
    try {
      val docs = Tables(spark, dir).documents
      Dedup.appendBucketed(
        Dedup.portableMinHashBandsFromDocs(docs), idxDir,
        "band_key", buckets)
      val total = new java.io.File(idxDir).listFiles()
        .count(_.getName.startsWith("bucket="))
      val batch = docs.filter(col("doc_id") < 4)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      val bandsN = Dedup.portableMinHashBandsFromDocs(batch)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val emptyBands = Dedup.portableMinHashBands(
        Dedup.portableShingles(docs.filter(lit(false))))
      val idxProbed = Dedup.readProbedBuckets(spark, idxDir,
        bandsN.select(col("band_key")), emptyBands, buckets)
      val probe = bandsN.as("n").join(idxProbed.as("o"),
        col("n.band_id") === col("o.band_id") &&
          col("n.band_key") === col("o.band_key"))
        .select(col("n.doc_id").as("id_a"), col("o.doc_id").as("id_b"))
        .distinct()
      val qe = probe.queryExecution
      val n = qe.executedPlan.executeCollect().length
      // the plan string truncates the Location path list; the path
      // COUNT of the index scan's InMemoryFileIndex is the receipt
      val probed = """InMemoryFileIndex\((\d+) paths\)\[[^\]]*bucket=""".r
        .findFirstMatchIn(qe.executedPlan.toString)
        .map(_.group(1)).getOrElse("?")
      println(s"=== bucketed index probe: B=$buckets, bucket dirs " +
        s"present=$total, probed dirs in scan=$probed, " +
        s"candidate rows=$n ===")
      println(qe.executedPlan.toString)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base)
      spark.stop()
    }
  }
}
