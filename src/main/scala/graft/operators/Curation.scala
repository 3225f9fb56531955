package graft.operators

import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the end-to-end flow
  * the individual north-star operators exist for:
  *
  *   documents → quality filter → near-dup removal (MinHash-LSH,
  *   keep-lowest-id) → content fingerprinting → curated corpus
  *
  * Every stage is one of the already-verified operators; the
  * composition itself stays a single declarative plan (no
  * materialization between stages), so Catalyst fuses the per-row
  * stages into the scan and the only shuffles are the dedup joins.
  */
object Curation {

  /** Quality gate shared with TextAnalysis.qualityScore (n08). */
  private def qualityOk: org.apache.spark.sql.Column =
    graft.functions.TextFunctions.qualityOk(col("text"), minTokens = 5)

  /** Source-level reputation gating — the C4/RefinedWeb "domain filter"
    * with the `source` column playing the domain role: aggregate quality
    * over each source (doc count, mean length, per-doc quality pass
    * rate), then gate every document by its source's reputation rather
    * than its own row alone.
    *
    * Scale shape: one source-keyed aggregate with map-side partials
    * (source cardinality ≪ corpus), then an explicitly broadcast join of
    * those stats back onto the corpus — the corpus itself never
    * shuffles. Means use exact integer sums (order-independent), so the
    * output is bit-stable at any parallelism.
    */
  def sourceReputation(
      docs: DataFrame, minDocs: Long = 3, minKeepRate: Double = 0.5): DataFrame = {
    val perSource = docs
      .groupBy("source")
      .agg(count(lit(1)).as("src_n_docs"),
        (sum(length(col("text"))).cast("double") / count(lit(1)))
          .as("src_mean_chars"),
        count(when(qualityOk, lit(1))).as("src_n_ok"))
      .withColumn("src_keep_rate",
        col("src_n_ok").cast("double") / col("src_n_docs"))
    docs.join(broadcast(perSource), "source")
      .select(col("doc_id"), col("source"), col("src_n_docs"),
        col("src_mean_chars"), col("src_n_ok"), col("src_keep_rate"),
        (col("src_n_docs") >= minDocs &&
          col("src_keep_rate") >= minKeepRate).as("src_ok"))
  }

  /** Curate a documents table: returns the surviving rows with their
    * content fingerprint. Near-dup policy: for every pair with n-gram
    * Jaccard ≥ `threshold` (MinHash-LSH candidates, exact-verified),
    * the higher doc_id is dropped — deterministic keep-first.
    */
  def pipeline(docs: DataFrame, n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val quality = docs.filter(qualityOk)
    val dupIds = Dedup.minHashPairs(quality, n, threshold)
      .select(col("id_b").as("doc_id")).distinct()
    quality
      .join(dupIds, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        fingerprint(col("text")).as("fp"))
  }
}
