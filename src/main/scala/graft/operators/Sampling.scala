package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (SURVEY §2.7 adjunct): training-data
  * pipelines need samples that are exact, reproducible, and
  * engine-independent — `RAND()`-based sampling is none of those, and
  * Spark's `sampleBy` is seeded-random per row. Systematic sampling
  * (every k-th row of a total order within each stratum) gives exact
  * per-stratum fractions (⌈n_s / k⌉ rows) with zero RNG state.
  *
  * Scale shape: one window partitioned BY THE STRATUM — parallelism is
  * the stratum count × AQE splitting; no global order, no partition-less
  * window. For very low-cardinality strata at extreme scale, substitute
  * the stratum-restricted [[GlobalOrder.withGlobalIndex]] rank.
  */
object Sampling {

  /** Keep rows whose 1-based rank within their stratum (ordered by
    * `orderCol`) is ≡ 1 (mod k) — expressed as `(rank − 1) % k == 0` so
    * the identity case k = 1 keeps every row (`rank % k == 1` would
    * keep none: any rank mod 1 is 0).
    */
  def stratifiedSystematic(
      df: DataFrame, stratum: Column, order: Column, k: Int): DataFrame = {
    require(k > 0, s"sampling interval must be > 0, got $k")
    val w = Window.partitionBy(stratum).orderBy(order)
    df.withColumn("_rk", row_number().over(w))
      .filter(pmod(col("_rk") - 1, lit(k)) === 0)
      .drop("_rk")
  }

  /** Deterministic training-mixture resampling: replicate (weight > 1)
    * or thin (weight < 1) each source to its target epoch weight,
    * expressed in integer per-mille so the realized fraction is EXACT —
    * a source at 2500‰ yields floor(2.5·n) ± 1 rows with zero RNG state.
    * The fractional remainder is spread by `id % 1000` (systematic, not
    * random — reproducible across engines, runs, and cluster sizes).
    * Sources absent from the map keep weight 1000‰ (pass-through).
    *
    * The exactness guarantee assumes ids are reasonably dense/uniform
    * modulo 1000 (sequential doc ids are). Block-allocated ids that
    * collide mod 1000 skew the realized remainder — pre-map such ids
    * through a hash (losing the cross-engine SQL oracle) or a dense
    * rank before reweighting.
    *
    * Scale shape: per-row arithmetic + a row explosion by its own copy
    * count; no shuffle at all. Emitted copies carry `copy_idx` so a
    * downstream packer/shuffler can decorrelate epochs.
    */
  def mixtureUpsample(
      df: DataFrame, id: Column, source: Column,
      perMille: Map[String, Int]): DataFrame = {
    require(perMille.values.forall(_ >= 0), "weights must be >= 0")
    val w = perMille.foldLeft(lit(1000)) { case (els, (s, v)) =>
      when(source === s, lit(v)).otherwise(els)
    }
    val copies = floor(w.cast("long") / 1000).cast("long") +
      when(pmod(id, lit(1000)) < w % 1000, 1L).otherwise(0L)
    df.withColumn("_n", copies)
      .filter(col("_n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n")
  }

  /** Per-source token-budget capping — the "no source dominates the
    * mix" governance rule: within each source, documents are taken in
    * deterministic doc_id order until the token budget is exhausted; a
    * document is kept iff its exclusive running-total start offset is
    * still under the budget (the crossing document is kept, matching
    * [[Packing.packSequences]]' start-based convention).
    *
    * Scale shape: one window partitioned BY SOURCE (parallelism = source
    * count — same story as [[stratifiedSystematic]]); the running total
    * is integer arithmetic, so the kept set is engine-independent.
    */
  def capSourceTokens(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be > 0, got $budget")
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).as("n_tokens"))
      .withColumn("start_off", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("kept", col("start_off") < budget)
  }

  /** Leakage-safe train/val/test split: the split key is the document's
    * NEAR-DUP CLUSTER representative ([[Clustering.dupClusters]]), not
    * the document itself, so near-duplicates can never straddle a split
    * boundary (the classic eval-contamination bug a per-doc split
    * invites). The bucket hash is a fixed LCG over the representative —
    * plain 64-bit integer arithmetic, reproducible in any engine, no RNG
    * state (same policy as [[stratifiedSystematic]]).
    *
    * Scale shape: adds only per-row arithmetic on top of the connected
    * components (which is the scale-dominant part, see n22); the split
    * assignment itself is shuffle-free.
    */
  def leakageSafeSplit(
      docs: DataFrame,
      n: Int,
      threshold: Double,
      trainPerMille: Int = 800,
      valPerMille: Int = 100): DataFrame = {
    require(trainPerMille > 0 && valPerMille >= 0 &&
      trainPerMille + valPerMille < 1000,
      s"per-mille weights must fit in [0, 1000): $trainPerMille/$valPerMille")
    // pre-reduce the representative mod 2^31 so the LCG multiply can't
    // overflow Long (max product ≈ 2.4e18 < 2^63) — Spark would wrap
    // sign-preserving while DuckDB errors, so the unreduced form isn't
    // engine-portable for ids beyond ~8.4e9
    val bucket = (pmod(col("component"), lit(2147483648L)) * lit(1103515245L) +
      lit(12345L)) % lit(2147483648L) % lit(1000L)
    Clustering.dupClusters(docs, n, threshold)
      .select(col("doc_id"), col("component"),
        bucket.cast("int").as("bucket"))
      .withColumn("split",
        when(col("bucket") < trainPerMille, lit("train"))
          .when(col("bucket") < trainPerMille + valPerMille, lit("val"))
          .otherwise(lit("test")))
  }

  /** Per-source quality-QUANTILE gate: keep each source's top
    * `keepFrac` fraction of documents by a composite quality score —
    * per-domain calibration (an absolute threshold keeps 95% of a clean
    * source and 5% of a noisy one; a quantile gate keeps the BEST slice
    * of every source, the standard mixture-shaping move before
    * sampling).
    *
    * Score = stopword_ratio − punct_ratio − digit_ratio (each term the
    * exact [[TextAnalysis.qualityScore]] arithmetic, subtracted left to
    * right — single-rounded IEEE, oracle-replayable). The gate is
    * integer-exact: rank-within-source (score desc, doc_id asc ties) ≤
    * ⌈keepFrac · source size⌉.
    *
    * Scale shape: one window partitioned BY SOURCE (parallelism =
    * source count × AQE; no global order), and the count is a window
    * aggregate over the same partitioning — one shuffle total. Output:
    * (doc_id, source, score, src_rank, n_src_docs, kept).
    */
  def qualityQuantileGate(docs: DataFrame, keepFrac: Double): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1,
      s"keepFrac must be in (0,1], got $keepFrac")
    val q = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"),
        (col("stopword_ratio") - col("punct_ratio") - col("digit_ratio"))
          .as("score"))
    val scored = docs.select(col("doc_id"), col("source")).join(q, "doc_id")
    val w = Window.partitionBy(col("source"))
      .orderBy(desc("score"), asc("doc_id"))
    val cw = Window.partitionBy(col("source"))
    scored
      .withColumn("src_rank", row_number().over(w))
      .withColumn("n_src_docs", count(lit(1)).over(cw))
      .withColumn("kept", col("src_rank") <=
        ceil(lit(keepFrac) * col("n_src_docs").cast("double")))
      .select("doc_id", "source", "score", "src_rank", "n_src_docs", "kept")
  }
}
