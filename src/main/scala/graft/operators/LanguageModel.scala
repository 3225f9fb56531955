package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-trained n-gram language-model scoring — the KenLM-style
  * fluency filter of pre-training pipelines (score each document by how
  * predictable its word sequence is under a model trained on the corpus
  * itself), in a deterministic, engine-portable form.
  *
  * The score is the per-document MEAN of the add-one-smoothed bigram
  * conditional likelihood p(w2|w1) = (c(w1,w2)+1) / (c(w1)+V), reported
  * in parts-per-million. Likelihoods, not log-likelihoods: libm `ln` is
  * not bit-identical across engines (see Sql FP policy), while each
  * likelihood here is one integer-exact division and the mean is an
  * order-insensitive decimal sum — so the score is reproducible to the
  * bit at any parallelism, on any engine. Ranking-wise the arithmetic
  * mean is the LM-score analogue of perplexity's geometric mean: both
  * order fluent-vs-disfluent documents the same way for a gate.
  *
  * Scale shape: the model is two hash aggregations (bigram counts, then
  * left-token totals folded from them — the corpus is never re-scanned);
  * scoring is an equi-join of the document bigrams against the model on
  * (w1,w2) then (w1) — AQE broadcasts a small model, shuffles a large
  * one, and either way there is no window, no global order, and the
  * per-document mean is a map-side-combinable aggregate. Vocabulary size
  * arrives via a broadcast one-row cross join.
  */
object LanguageModel {

  /** Per-document bigram fluency: (doc_id, n_bigrams, mean_bigram_ppm,
    * fluency_ok). Documents with fewer than 2 tokens score null (no
    * bigrams) with n_bigrams = 0.
    */
  def bigramFluency(docs: DataFrame, okPpmThreshold: Long = 1000L): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize the pair array before exploding (explode-first form —
    // a HOF inside the generate is an order of magnitude slower); the
    // bigram table feeds BOTH model training and scoring — persist so
    // the tokenize+explode runs once (same diamond policy as Dedup).
    // Pairs come from zipping the two adjacent slices — total on ANY
    // input (a 1-token doc zips to an empty array), unlike
    // element_at(i+2) indexing which is only safe behind a filter the
    // optimizer must not reorder.
    val bg = toks
      .select(col("doc_id"),
        zip_with(
          slice(col("ts"), lit(1), greatest(size(col("ts")) - 1, lit(0))),
          slice(col("ts"), lit(2), greatest(size(col("ts")) - 1, lit(0))),
          (a, b) => struct(a.as("w1"), b.as("w2"))).as("pairs"))
      .select(col("doc_id"), explode(col("pairs")).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    val vocab = toks
      .select(explode(col("ts")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val scored = bg
      .join(c12, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .crossJoin(broadcast(vocab))
      // ppm scaling keeps ~9 significant digits through the DECIMAL(28,6)
      // mean; numerator stays integer-exact (< 2^53) before the single
      // double division
      .select(col("doc_id"),
        (((col("c12") + 1) * lit(1000000L)).cast("double") /
          (col("c1") + col("v"))).as("p_ppm"))
    val perDoc = scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      (sum(col("p_ppm").cast(DecimalType(28, 6))).cast("double") /
        count(lit(1))).as("mean_bigram_ppm"))
    // spine from the persisted toks, not a second scan of the source
    val out = toks.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("mean_bigram_ppm"),
        (col("mean_bigram_ppm") >= okPpmThreshold).as("fluency_ok"))
    graft.DiamondCaches.register(toks, graft.DiamondCaches.register(bg, out))
  }
}
