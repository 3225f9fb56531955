package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-data-pipeline operators (SURVEY §2.7):
  * tokenization, word shingles, MinHash signatures, SimHash, rolling-hash
  * fingerprints. Everything is expression-level (no UDFs): per-row work
  * stays inside the scan stage and scales linearly with corpus size.
  */
object TextFunctions {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** `n`-word shingles joined with single spaces; rows with fewer than
    * `n` tokens yield the whole text as one shingle.
    */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))

  /** Distinct shingle set used by Jaccard / MinHash dedup. */
  def shingleSet(text: Column, n: Int): Column =
    array_distinct(wordShingles(tokens(text), n))

  /** Distinct xxhash64 hashes of the `n`-word shingles, fused into one
    * native expression ([[graft.expressions.WordShingleHashes]]) — the
    * form the dedup operators consume (shingle strings never
    * materialize).
    */
  def shingleHashes(text: Column, n: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.WordShingleHashes(
      ColumnBridge.expression(text), n))
  }

  /** Unicode NFC normalization ([[graft.expressions.NfcNormalize]]) —
    * run before [[fingerprint]]/shingling on any non-ASCII corpus so
    * composed and decomposed encodings dedup together.
    */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.NfcNormalize(
      ColumnBridge.expression(text)))
  }

  /** MinHash signature over pre-hashed shingles ([[shingleHashes]]). */
  def minHashSignatureFromHashes(hashes: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.MinHashSigFromHashes(
      ColumnBridge.expression(hashes), minHashCoeffs(numHashes)))
  }

  /** 256-bin byte histogram of the text's UTF-8 encoding
    * ([[graft.expressions.ByteHistogram]]): one scan-stage pass per row;
    * diversity statistics (distinct bytes, Σc², max count) derive from
    * it as integer-exact array folds.
    */
  def byteHistogram(text: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.ByteHistogram(
      ColumnBridge.expression(text)))
  }

  // --- MinHash -----------------------------------------------------------

  /** Mersenne prime 2^31-1; base hashes and the affine family stay below
    * 2^31 so `a*x + b` can't overflow a long.
    */
  val MinHashPrime: Long = 2147483647L

  /** Deterministic affine-hash family (a_i, b_i), seed fixed so the
    * signature (and the LSH buckets derived from it) is reproducible
    * across runs and cluster sizes.
    */
  def minHashCoeffs(numHashes: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (1L + rng.nextInt((MinHashPrime - 1).toInt).toLong,
        rng.nextInt(MinHashPrime.toInt).toLong))
  }

  /** MinHash signature (array of `numHashes` longs) over a distinct
    * shingle array — a native Catalyst expression
    * ([[graft.expressions.MinHashSig]]): one tight loop per row instead
    * of O(numHashes × |shingles|) interpreted lambda steps.
    */
  def minHashSignature(shingles: Column, numHashes: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.MinHashSig(
      ColumnBridge.expression(shingles), minHashCoeffs(numHashes)))
  }

  /** LSH band keys for a MinHash signature: `numBands` hashes, each over
    * a contiguous `rowsPerBand` slice. Returned as array of structs
    * (band_id, band_key) ready to explode into the bucket join.
    */
  def lshBands(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    array((0 until numBands).map { j =>
      struct(
        lit(j).as("band_id"),
        xxhash64(lit(j), slice(sig, j * rowsPerBand + 1, rowsPerBand))
          .as("band_key"))
    }: _*)

  // --- SimHash -----------------------------------------------------------

  /** 64-bit SimHash over a token array: per-token xxhash64, each bit
    * votes ±1, the sign of the vote becomes the output bit — a native
    * Catalyst expression ([[graft.expressions.SimHash64]]), one pass
    * over the tokens per row.
    */
  def simHash(toks: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.SimHash64(
      ColumnBridge.expression(toks)))
  }

  /** Hamming distance between two 64-bit hashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  // --- Fingerprinting ----------------------------------------------------

  /** The corpus quality gate shared by the batch curation operators
    * (Curation / n08 / n15, minTokens = 5) and streaming curation (s16,
    * minTokens = 25 on normalized text): enough tokens, bounded
    * punctuation and digit ratios. One definition so a threshold
    * retune cannot leave a caller checking stale values.
    */
  def qualityOk(text: Column, minTokens: Int): Column = {
    val nChars = length(text).cast("double")
    val punct = nChars - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    val digits = nChars - length(regexp_replace(text, "[0-9]", ""))
    (size(split(text, " ")) >= minTokens) &&
      (punct / nChars < 0.2) && (digits / nChars < 0.3)
  }

  /** Whitespace-normalized lowercase form used as the canonical text for
    * exact-dup keys and fingerprints.
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Content fingerprint: first 16 hex chars of md5 over the normalized
    * text — the exact-dedup key that survives case/whitespace noise.
    */
  def fingerprint(text: Column): Column =
    substring(md5(normalized(text)), 1, 16)

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD'03 shape):
    * rolling k-gram character hashes, then the min of each window of `w`
    * consecutive hashes, deduplicated. Near-identical documents share
    * most selected fingerprints; used as a third near-dup signal.
    */
  def winnowingFingerprints(text: Column, k: Int, w: Int): Column = {
    val t = normalized(text)
    val nGrams = greatest(length(t) - (k - 1), lit(1))
    val grams = transform(sequence(lit(1), nGrams), i =>
      pmod(xxhash64(t.substr(i, lit(k))), lit(MinHashPrime)))
    val nWin = greatest(size(grams) - (w - 1), lit(1))
    array_distinct(transform(sequence(lit(0), nWin - 1), i =>
      array_min(slice(grams, i + 1, lit(w)))))
  }
}
