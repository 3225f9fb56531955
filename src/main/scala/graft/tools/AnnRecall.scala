package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured recall@k of every ANN tier against the brute-force exact
  * answer — the quantitative face of the similarity stack's
  * speed/recall trade (the engine's tiers: brute → LSH buckets → IVF
  * lists → PQ codes). Recall here is the strict pair-set kind:
  * |approx top-k ∩ exact top-k| / (|Q|·k) over the 10-query fixture
  * set, ties broken identically in every tier (desc score, asc id), so
  * the numbers are deterministic and reproducible.
  *
  * Two fixtures, printed as two tables:
  *
  *   1. RANDOM (control): the raw synthetic embeddings, queries =
  *      vec_id < 10. Random vectors have no planted neighbor structure,
  *      so recall here is bounded by each tier's candidate budget — the
  *      honest read is lift-over-chance, not the absolute number (see
  *      docs/PLANS.md "ANN recall").
  *   2. PLANTED (discrimination): queries are seeded-Gaussian
  *      perturbations of corpus vectors 20..29 (σ = 5% of each vector's
  *      RMS ⇒ cosine(source, query) ≈ 0.999, far above the random-pair
  *      bulk). A tier that actually discriminates must put the planted
  *      source in the same bucket/list as its perturbation; the
  *      `src@k` column is the fraction of queries whose true source
  *      survives into the tier's top-k. On this fixture recall measures
  *      neighbor structure capture, not budget share.
  *
  * Run: sbt "runMain graft.tools.AnnRecall [sfDir] [k]"
  * Results table: docs/PLANS.md "ANN recall" section.
  */
object AnnRecall {

  /** Deterministic near-duplicate queries: corpus vectors `srcIds`,
    * each dimension nudged by N(0, (0.05·RMS)²) under a per-source
    * seed. New ids sit at `idBase + i` so they can never collide with
    * corpus ids. Returns (queries, Map[queryId -> sourceId]).
    */
  private def plantQueries(
      spark: SparkSession,
      emb: DataFrame,
      srcIds: Seq[Long],
      idBase: Long): (DataFrame, Map[Long, Long]) = {
    import spark.implicits._
    val src = emb.filter(col("id").isin(srcIds: _*))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val planted = src.zipWithIndex.map { case ((srcId, v), i) =>
      val rng = new scala.util.Random(1000L + srcId)
      val rms = math.sqrt(v.map(x => x.toDouble * x).sum / v.length)
      val sigma = 0.05 * rms
      (idBase + i, v.map(x => (x + sigma * rng.nextGaussian()).toFloat))
    }
    val srcOf = planted.map(_._1).zip(src.map(_._1)).toMap
    (planted.toSeq.toDF("id", "embedding"), srcOf)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.build("graft-ann-recall")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id").as("id"), col("embedding"))

    def pairs(df: DataFrame): Set[(Long, Long)] = df
      .select("q_id", "n_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    def tiers(queries: DataFrame): Seq[(String, DataFrame)] = Seq(
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
      "ivf fixed nProbe=2/16" ->
        Similarity.ivfTopK(queries, emb, k),
      "ivf fixed nProbe=4/16" ->
        Similarity.ivfTopK(queries, emb, k, nProbe = 4),
      "ivf lloyd k=8 nProbe=2" ->
        Similarity.ivfTopKLloyd(queries, emb, k),
      "ivf lloyd k=8 nProbe=4" ->
        Similarity.ivfTopKLloyd(queries, emb, k, nProbe = 4),
      "pq 4x16 codebookK=4" ->
        Similarity.pqTopK(queries, emb, k))

    def table(label: String, queries: DataFrame,
        srcOf: Map[Long, Long]): Unit = {
      val exact = pairs(Similarity.bruteTopK(queries, emb, k))
      val srcCol = if (srcOf.nonEmpty) "  src@k" else ""
      println(f"%n== $label ==")
      println(f"${"tier"}%-24s recall@$k$srcCol  (exact pairs: ${exact.size})")
      tiers(queries).foreach { case (name, df) =>
        val got = pairs(df)
        val recall = (got intersect exact).size.toDouble / exact.size
        val src =
          if (srcOf.isEmpty) ""
          else {
            val hit = srcOf.count { case (q, s) => got.contains((q, s)) }
            f"  ${hit.toDouble / srcOf.size}%6.3f"
          }
        println(f"$name%-24s $recall%6.3f$src")
      }
    }

    table("random fixture (control)", emb.filter(col("id") < 10), Map.empty)
    val (planted, srcOf) =
      plantQueries(spark, emb, (20L until 30L).toSeq, 1000000L)
    table("planted near-duplicates", planted, srcOf)
    spark.stop()
  }
}
