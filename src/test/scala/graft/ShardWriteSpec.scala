package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The write side of n97's token-balanced sharding plan (the r9/r10
  * residue: the serpentine assignment was oracle-green but no bytes
  * ever landed). This spec materializes the plan at sf0.1 — the
  * smallest SF where `documents` actually grows (5,000 docs; sf0.01 is
  * row-identical to sf0.001, the r10 cross-SF lesson) — and asserts
  * planned == realized exactly, plus measures the file-size balance the
  * plan's whole point is to deliver. The measured skew is recorded in
  * docs/PLANS.md.
  */
class ShardWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.1"
  private val nShards = 16

  test("n97 write side: partitionBy(shard) realizes the planned token totals exactly") {
    val P = graft.operators.Packing
    val base = java.nio.file.Files.createTempDirectory("graft_shardwrite_")
    val out = s"$base/sharded"
    try {
      val docs = Tables(spark, dir).documents
      val plan = P.balancedShards(docs, nShards)
        .localCheckpoint() // one plan, used for both predict and write
      val planned = plan.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_total"))
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val realized = P.writeSharded(docs, plan, out)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      assert(realized == planned,
        "the written files do not realize the planned shard totals")
      assert(planned.keySet == (0 until nShards).toSet,
        "every shard must receive documents")

      // balance, as realized: per-shard token totals (the quantity the
      // serpentine balances) and on-disk file sizes (what a dataloader
      // actually streams). One part-file per shard by construction
      // (repartition(shard)), so file size ~ text volume + fixed
      // parquet overhead.
      val toks = planned.values.map(_._2.toDouble).toSeq
      val tokSkew = (toks.max - toks.min) / (toks.sum / toks.size)
      assert(tokSkew < 0.01,
        f"serpentine token totals spread $tokSkew%.4f — expected <1%%")

      val shardDirs = new java.io.File(out).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      assert(shardDirs.length == nShards)
      val sizes = shardDirs.map(_.listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum.toDouble)
      assert(sizes.forall(_ > 0))
      val fileSkew = (sizes.max - sizes.min) / (sizes.sum / sizes.size)
      info(f"realized file-size skew (max-min)/mean = $fileSkew%.4f")
      assert(fileSkew < 0.05,
        f"realized file sizes spread $fileSkew%.4f — expected <5%%")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(base.toFile)
    }
  }
}
