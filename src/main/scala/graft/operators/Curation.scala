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

  /** The round-6 composed pipeline — the same end-to-end idea as
    * [[pipeline]], built from the per-source-calibrated operators:
    *
    *   documents → boilerplate n-gram removal (per-source df ≥
    *   `boilerFrac`) → drop fully-boilerplated docs → per-source
    *   quality-QUANTILE gate (top `keepFrac` by composite score, ON THE
    *   CLEANED TEXT — gating before cleanup would score the chrome) →
    *   near-dup clusters over the cleaned text keeping the
    *   HIGHEST-QUALITY member.
    *
    * Still one declarative plan end to end: the cleanup rebuild and
    * scoring fuse into scan-stage projections, and the only shuffles
    * are the boilerplate df aggregate, the two partitioned windows, and
    * the dedup joins. Output: one row per surviving document —
    * (doc_id, source, component, score).
    */
  def pipelineV2(
      docs: DataFrame,
      boilerN: Int = 2,
      boilerFrac: Double = 0.2,
      keepFrac: Double = 0.5,
      dupN: Int = 3,
      dupThreshold: Double = 0.8): DataFrame = {
    // the cleaned corpus is the pipeline's pivot: the gate scans it, the
    // survivor join scans it, and the dedup stage scans it twice more
    // (shingles + scoring) — without the persist the boilerplate
    // interval-union rebuild re-runs per branch (measured 9.3 s → 6.3 s
    // cold at sf0.1). Same diamond-persist policy as the dedup
    // operators; a 100 TB pipeline would write this intermediate out.
    val cleaned = Dedup.boilerplateRemoval(docs, boilerN, boilerFrac)
      .filter(col("n_kept") > 0)
      .select(col("doc_id"), col("source"), col("cleaned_text").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val survivors = cleaned.join(
      Sampling.qualityQuantileGate(cleaned, keepFrac)
        .filter(col("kept")).select("doc_id"),
      "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = Clustering.dupClustersKeepBest(survivors, dupN, dupThreshold)
      .filter(col("keep"))
      .join(survivors.select("doc_id", "source"), "doc_id")
      .select("doc_id", "source", "component", "score")
    graft.DiamondCaches.register(cleaned,
      graft.DiamondCaches.register(survivors, out))
  }

  /** Corpus release healthcheck — the one-row report a snapshot ships
    * with, composing the per-doc signals the individual operators
    * verify: size (docs/tokens/mean), exact-duplicate rate
    * (fingerprint-distinct), both quality gates' keep rates, the PII
    * incidence, and language coverage. Every rate is an exact integer
    * count over one division, so the whole row sits under the hash
    * oracle.
    *
    * Scale shape: ONE corpus scan computing all per-doc signals
    * (fingerprint, token count, gate predicates, PII regexes — all
    * scan-stage) plus a single multi-distinct aggregation (Spark
    * plans it with an expand, the q38 shape). Nothing driver-side.
    */
  def releaseHealthcheck(docs: DataFrame): DataFrame = {
    val piiHit = TextAnalysis.PiiPatterns
      .map { case (_, pat, _) =>
        size(regexp_extract_all(col("text"), lit(pat), lit(0))) > 0
      }
      .reduce(_ || _)
    // genuinely ONE scan: every signal — fingerprint, token count,
    // both gate predicates, the PII regexes — is a per-row expression
    // in the same projection (no doc_id joins, no rescans)
    val base = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      fingerprint(col("text")).as("fp"),
      piiHit.as("pii_hit"),
      TextAnalysis.qualityOkCol.as("quality_ok"),
      TextAnalysis.gopherOkCol.as("gopher_ok"))
    base
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        countDistinct(col("fp")).as("n_distinct"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("quality_ok"), 1L).otherwise(0L)).as("n_quality_ok"),
        sum(when(col("gopher_ok"), 1L).otherwise(0L)).as("n_gopher_ok"),
        sum(when(col("pii_hit"), 1L).otherwise(0L)).as("n_pii_docs"))
      .select(col("n_docs"), col("n_tokens"), col("n_distinct"),
        col("n_langs"),
        (lit(1.0) - col("n_distinct").cast("double") /
          col("n_docs").cast("double")).as("dup_rate"),
        (col("n_quality_ok").cast("double") / col("n_docs").cast("double"))
          .as("quality_keep_rate"),
        (col("n_gopher_ok").cast("double") / col("n_docs").cast("double"))
          .as("gopher_keep_rate"),
        (col("n_pii_docs").cast("double") / col("n_docs").cast("double"))
          .as("pii_doc_rate"),
        (col("n_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"))
  }
}
