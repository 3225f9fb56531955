package graft.operators

import graft.functions.TextFunctions.shingleHashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag corpus documents whose n-gram shingle
  * sets are substantially contained in some benchmark/eval document —
  * the standard pre-training hygiene step (a training doc that contains
  * an eval item inflates downstream scores).
  *
  * Containment (not Jaccard) is the right asymmetry: a short eval item
  * buried in a long training doc still contaminates. Score per corpus
  * doc = max over benchmark docs of |S_doc ∩ S_bench| / |S_doc|.
  *
  * Scale shape: shingles are 64-bit hashes computed scan-side
  * ([[graft.functions.TextFunctions.shingleHashes]] native expression);
  * the benchmark side is small by nature (eval suites) and broadcasts,
  * so the corpus is never shuffled — overlap counting is a broadcast
  * hash join on the shingle hash followed by a (doc, bench) aggregate.
  */
object Decontamination {

  /** docs/benchmark: (doc_id, text, ...). Output: one row per
    * contaminated corpus doc — (doc_id, bench_id of the strongest match,
    * containment ∈ [threshold, 1]), ties on containment broken by lowest
    * bench_id. Self-pairs (same id in both sets) are excluded.
    */
  def flagContaminated(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int,
      threshold: Double): DataFrame = {
    // feeds both the inverted index and the size table (diamond) —
    // persist so the native shingle hashing runs once over the corpus,
    // same policy as the Dedup intermediates
    val corpusTok = docs
      .select(col("doc_id"), shingleHashes(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchInv = benchmark
      .select(col("doc_id").as("bench_id"),
        explode(shingleHashes(col("text"), n)).as("h"))
    val corpusInv = corpusTok.select(col("doc_id"), explode(col("sh")).as("h"))
    val sizes = corpusTok.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val overlap = corpusInv
      .join(broadcast(benchInv), "h")
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
    graft.DiamondCaches.register(corpusTok,
      rankContainment(overlap, sizes, threshold))
  }

  /** Shared scoring tail: normalize overlap counts by corpus shingle-set
    * size, keep doc-bench pairs at or above `threshold`, and elect each
    * doc's strongest match (ties on containment -> lowest bench_id).
    * Both decontamination variants MUST share this so the Bloom path's
    * "row-for-row identical to exact" contract cannot drift.
    */
  private def rankContainment(
      overlap: DataFrame, sizes: DataFrame, threshold: Double): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("containment"), asc("bench_id"))
    overlap.join(sizes, "doc_id")
      .withColumn("containment", col("inter").cast("double") / col("n_sh"))
      .filter(col("containment") >= threshold)
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(col("doc_id"), col("bench_id"), col("containment"))
  }

  /** [[flagContaminated]] for a benchmark too large to broadcast: a
    * Bloom filter over the benchmark's shingle hashes (built with
    * Spark's own `BloomFilterAggregate`, the sketch behind runtime join
    * filtering) is collected as a few-hundred-KB byte array, broadcast
    * as a literal into a scan-stage `BloomFilterMightContain` predicate,
    * and drops every corpus shingle with no possible benchmark match
    * BEFORE the overlap join. Bloom filters have no false negatives, so
    * the result is row-for-row IDENTICAL to the exact operator — false
    * positives only let a few extra shingles into the join, where the
    * exact equi-join discards them.
    *
    * Scale shape: the n18 variant ships the whole benchmark index to
    * every executor (fine for eval suites); this one ships a sketch and
    * shuffles only surviving shingles into a plain equi-join — the right
    * trade once the benchmark index is GBs. Sketch size is driver-held
    * model state, like the k-means codebook.
    */
  def flagContaminatedBloom(
      docs: DataFrame,
      benchmark: DataFrame,
      n: Int,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    val corpusTok = docs
      .select(col("doc_id"), shingleHashes(col("text"), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val benchInv = benchmark
      .select(col("doc_id").as("bench_id"),
        explode(shingleHashes(col("text"), n)).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ~10 bits/item ≈ 1% fpp; the count pass also warms the persisted
    // benchmark index the overlap join reads again. numBits is capped at
    // the engine's runtime-bloom-filter ceiling (64M bits = 8 MB sketch):
    // BloomFilterAggregate REJECTS a larger request at analysis time, and
    // past that size the fpp degrades gracefully (more join work, never a
    // lost pair) rather than the query failing on a billion-shingle
    // benchmark.
    // same story for estimatedNumItems (4M-item analysis ceiling)
    val nItems = math.min(math.max(benchInv.count(), 1L), 4000000L)
    val numBits = math.min(nItems * 10L, 67108864L)
    val bloomAgg = ColumnBridge.column(
      BloomFilterAggregate(ColumnBridge.expression(col("h")),
        Literal(nItems), Literal(numBits), 0, 0).toAggregateExpression())
    val bloomBytes = benchInv.select(bloomAgg.as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val corpusInv = corpusTok
      .select(col("doc_id"), explode(col("sh")).as("h"))
      .filter(ColumnBridge.column(BloomFilterMightContain(
        Literal(bloomBytes), ColumnBridge.expression(col("h")))))
    val sizes = corpusTok.select(col("doc_id"), size(col("sh")).as("n_sh"))
    val overlap = corpusInv
      .join(benchInv, "h") // deliberately NOT broadcast: the large-bench path
      .filter(col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("inter"))
    graft.DiamondCaches.register(corpusTok,
      graft.DiamondCaches.register(benchInv,
        rankContainment(overlap, sizes, threshold)))
  }

  /** EMBEDDING-space decontamination — the semantic sibling of the
    * n-gram variants above: a paraphrased eval item shares no shingles
    * with its contaminated training doc, but their embeddings stay
    * close, so the third member of the decontamination family flags
    * corpus vectors whose cosine to ANY eval vector reaches
    * `threshold`. Candidates come from one LSH sign-bucket table with
    * single-bit multi-probing on the EVAL side (the n53 recall knob
    * that never re-hashes the corpus: eval items fan out into
    * 1 + numPlanes probe buckets; the corpus is bucketed once,
    * scan-stage); every candidate is verified with the exact cosine, so
    * a flagged pair is never a false positive — missed pairs are the
    * documented candidate-bounded contract every LSH surface here
    * shares (n06/n52/n53).
    *
    * Scale shape: corpus bucketing is per-row expression work; the
    * probe table is (eval × (numPlanes+1)) rows — eval suites are
    * small, so it broadcasts; the candidate equi-join on the bucket key
    * never shuffles the corpus; the exact verify runs on candidates
    * only. A pair collides in at most one probe bucket (its bucket-xor
    * is a constant), so no dedup step is needed.
    *
    * Output: (vec_id, eval_id, cos_sim) for every verified
    * contaminated pair.
    */
  def flagContaminatedEmbedding(
      corpus: DataFrame,
      evalSet: DataFrame,
      threshold: Double,
      numPlanes: Int = 8,
      dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    val planes = Similarity.hyperplanes(numPlanes, dim, seed)
    val cb = corpus.select(col("vec_id"), col("embedding"),
      Similarity.bucketExpr(col("embedding"), planes).as("bucket"))
    val flips = array((lit(0L) +: (0 until numPlanes)
      .map(j => lit(1L << j))): _*)
    val probes = evalSet
      .select(col("vec_id").as("eval_id"), col("embedding").as("e_emb"),
        Similarity.bucketExpr(col("embedding"), planes).as("b0"))
      .withColumn("flip", explode(flips))
      .select(col("eval_id"), col("e_emb"),
        col("b0").bitwiseXOR(col("flip")).as("bucket"))
    cb.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("eval_id"))
      .select(col("vec_id"), col("eval_id"),
        graft.functions.VectorFunctions.cosine(
          col("embedding"), col("e_emb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
