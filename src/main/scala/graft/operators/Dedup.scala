package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora (SURVEY §2.7).
  *
  * Scale design: every variant is a bounded number of shuffles keyed on
  * content-derived hashes (never on raw text), with per-key fan-in capped
  * by construction:
  *   - exact: one hash-aggregate on a 16-byte fingerprint.
  *   - MinHash-LSH: signature computed per-row in the scan stage; the
  *     candidate join is per (band, bucket) — only same-bucket docs meet,
  *     so work is Σ bucket² rather than corpus².
  *   - SimHash: candidate blocking on 16-bit chunks (pigeonhole: any pair
  *     within hamming distance 3 shares at least one of 4 chunks).
  */
object Dedup {

  /** Exact duplicate groups keyed by normalized-text fingerprint;
    * keeps the lowest doc_id as the canonical representative.
    */
  def exactGroups(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .groupBy("fp")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact-dedup projection: one surviving row per distinct normalized
    * text (distributed `dropDuplicates` on the fingerprint).
    */
  def exactDedup(docs: DataFrame): DataFrame =
    docs.withColumn("fp", fingerprint(col("text")))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .drop("rk")

  /** All-pairs n-gram Jaccard similarity ≥ threshold, computed exactly
    * via an inverted shingle index (explode + join on shingle, count
    * co-occurrences, normalize by set sizes). Exact but quadratic in the
    * worst case — at 100 TB use [[minHashPairs]] and keep this as the
    * verification stage on its candidate output.
    */
  def jaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val tok = docs
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    // join on a 64-bit shingle hash, not the string — smaller shuffle
    val inverted = tok.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("sh_hash"))
    val inter = inverted.as("a")
      .join(inverted.as("b"), col("a.sh_hash") === col("b.sh_hash"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    val sizes = tok.select(col("doc_id"), size(col("sh")).as("n_sh"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash + LSH near-duplicate pairs: per-row signature → band-bucket
    * explode → same-bucket candidate generation → exact-Jaccard
    * verification of candidates only. False positives are eliminated by
    * the verify stage; recall is 1-(1-t^r)^b per pair of true Jaccard t.
    */
  def minHashPairs(
      docs: DataFrame,
      n: Int,
      threshold: Double,
      numBands: Int = 16,
      rowsPerBand: Int = 8): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val tok = docs
      .select(col("doc_id"), shingleSet(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = tok.select(col("doc_id"),
      minHashSignature(col("sh"), numHashes).as("sig"))
    val buckets = sig
      .select(col("doc_id"),
        explode(lshBands(col("sig"), numBands, rowsPerBand)).as("band"))
      .select(col("doc_id"), col("band.band_id").as("band_id"),
        col("band.band_key").as("band_key"))
    val candidates = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact-Jaccard verify on candidates only
    val sizes = tok.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val inverted = tok.select(col("doc_id"), explode(col("sh")).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("sh_hash"))
    val inter = inverted.as("ia")
      .join(candidates, col("ia.doc_id") === col("id_a"))
      .join(inverted.as("ib"),
        col("ib.doc_id") === col("id_b") &&
          col("ia.sh_hash") === col("ib.sh_hash"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("id_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("id_b") === col("sb.doc_id"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash near-duplicate candidate pairs within a hamming radius.
    * Blocking: split the 64-bit hash into 4 16-bit chunks; any pair with
    * hamming ≤ 3 must agree on ≥ 1 chunk (pigeonhole), so candidates are
    * generated per chunk value and verified with `bit_count`.
    */
  def simHashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk blocking guarantees recall only to hamming 3")
    val hashed = docs.select(col("doc_id"),
      simHash(tokens(normalized(col("text")))).as("sh64"))
    val chunks = hashed.select(col("doc_id"), col("sh64"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk_id"),
          shiftright(col("sh64"), c * 16).bitwiseAND(0xFFFFL).as("chunk"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("sh64"),
        col("ck.chunk_id").as("chunk_id"), col("ck.chunk").as("chunk"))
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk_id") === col("b.chunk_id") &&
          col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        hamming(col("a.sh64"), col("b.sh64")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }
}
