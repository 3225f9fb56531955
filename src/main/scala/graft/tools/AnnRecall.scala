package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measured recall@k of every ANN tier against the brute-force exact
  * answer — the quantitative face of the similarity stack's
  * speed/recall trade (the engine's tiers: brute → LSH buckets → IVF
  * lists → PQ codes). Recall here is the strict pair-set kind:
  * |approx top-k ∩ exact top-k| / (|Q|·k) over the 10-query fixture
  * set, ties broken identically in every tier (desc score, asc id), so
  * the numbers are deterministic and reproducible.
  *
  * Run: sbt "runMain graft.tools.AnnRecall [sfDir] [k]"
  * Results table: docs/PLANS.md "ANN recall" section.
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.build("graft-ann-recall")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id").as("id"), col("embedding"))
    val queries = emb.filter(col("id") < 10)

    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(Similarity.bruteTopK(queries, emb, k))
    val tiers: Seq[(String, DataFrame)] = Seq(
      "lsh 1 table (8 planes)" ->
        Similarity.lshTopK(queries, emb, k),
      "lsh 2 tables (OR)" ->
        Similarity.lshTopK(queries, emb, k, numTables = 2),
      "lsh 4 tables (OR)" ->
        Similarity.lshTopK(queries, emb, k, numTables = 4),
      "lsh multiprobe 1 bit" ->
        Similarity.lshMultiProbeTopK(queries, emb, k),
      "lsh multiprobe 2 bits" ->
        Similarity.lshMultiProbeTopK(queries, emb, k, probeBits = 2),
      "ivf nProbe=2/16" ->
        Similarity.ivfTopK(queries, emb, k),
      "ivf nProbe=4/16" ->
        Similarity.ivfTopK(queries, emb, k, nProbe = 4),
      "pq 4x16 codebookK=4" ->
        Similarity.pqTopK(queries, emb, k))
    println(f"${"tier"}%-24s recall@$k  (exact pairs: ${exact.size})")
    tiers.foreach { case (name, df) =>
      val got = pairs(df)
      val recall = (got intersect exact).size.toDouble / exact.size
      println(f"$name%-24s $recall%6.3f")
    }
    spark.stop()
  }
}
