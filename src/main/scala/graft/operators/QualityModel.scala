package graft.operators

import graft.functions.TextFunctions.{normalized, tokens}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Trained discriminative quality filter — the CCNet/GPT-3-era recipe
  * (classify "looks like curated reference corpus" vs "everything
  * else") as opposed to the heuristic word-shape scores of
  * [[TextAnalysis.qualityScore]] and the generative importance ratios
  * of DSIR ([[Sampling]]): hashed bag-of-words features, logistic-style
  * model, batch gradient descent trained INSIDE the engine.
  *
  * Everything is engineered for cross-engine FP exactness so the whole
  * training trajectory sits under the DuckDB hash oracle:
  *   - features are md5-derived 64-bucket hashes (the n63 portable-hash
  *     precedent — ascii arithmetic on hex digits, no engine-native
  *     hash), count-normalized by exact integer token counts;
  *   - the squashing function is the "fast sigmoid"
  *     σ(m) = 0.5 + (0.5·m)/(1+|m|) — only +,·,/,abs, all IEEE-exact,
  *     no libm `exp` (whose last-ulp behavior differs across engines;
  *     same no-transcendentals policy as n42/n61);
  *   - every FP aggregation (per-doc margins, per-bucket gradients)
  *     routes through DECIMAL(38,12) — exact, order-free addition —
  *     and back to double (the pagerank DECIMAL-sum precedent).
  *
  * Scale shape: the corpus is touched once per iteration as a
  * scan + two keyed aggregations (per-doc margin, per-bucket gradient);
  * model state is 64+1 doubles collected per round — the bounded
  * codebook pattern ([[Clustering.lloydCents]], reference capability
  * analog: the fold-to-sink accumulator `Stream.scala:210-230`). At
  * 100 TB the per-iteration shuffles are bucket/doc-keyed partial
  * aggregations (map-side combine bounds them at 64 rows per task),
  * and the broadcastable model never exceeds the feature dimension.
  */
object QualityModel {
  /** Feature dimension. Hardwired to 64 because the portable bucket is
    * decoded from the first two md5 hex digits as (d0 % 4)·16 + d1;
    * changing it means changing the decode in BOTH engines.
    */
  val Dim = 64

  /** Portable feature bucket of a token's md5 hex string: integer
    * arithmetic over the first two hex digits, identical in any engine
    * with ascii()/substring() (n63's decode).
    */
  private def bucketExpr(hexCol: String): String = {
    def hexDigit(i: Int): String =
      s"""(CASE WHEN ascii(substring($hexCol, $i, 1)) >= 97
                THEN ascii(substring($hexCol, $i, 1)) - 87
                ELSE ascii(substring($hexCol, $i, 1)) - 48 END)"""
    s"((${hexDigit(1)} % 4) * 16 + ${hexDigit(2)})"
  }

  /** Fast sigmoid — IEEE-exact squashing (no exp). */
  private def sig(m: Column): Column =
    lit(0.5) + (lit(0.5) * m) / (lit(1.0) + abs(m))

  /** Exact order-free double sum (DECIMAL(38,12) route). */
  private def xsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** Train `iters` full-batch gradient steps of the quality classifier
    * (positive class = `positiveSources`) and score every document with
    * the final model. Output: (doc_id, label, score, pred), one row per
    * input document.
    */
  def trainedQualityScores(
      docs: DataFrame,
      positiveSources: Seq[String],
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // (doc_id, b, x): count-normalized bucket frequencies. The total
    // token count rides along from the pre-explode size() so no second
    // aggregation or window is needed (the Dedup n_sh pattern).
    val x = docs
      .select(col("doc_id"),
        size(tokens(normalized(col("text")))).as("n"),
        explode(tokens(normalized(col("text")))).as("t"))
      .select(col("doc_id"), col("n"), md5(col("t")).as("h"))
      .select(col("doc_id"), col("n"), expr(bucketExpr("h")).as("b"))
      .groupBy(col("doc_id"), col("n"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("b"),
        (col("c").cast("double") / col("n").cast("double")).as("x"))
    val lab = docs.select(col("doc_id"),
      when(col("source").isin(positiveSources: _*), lit(1.0))
        .otherwise(lit(0.0)).as("y"))
    // training diamond: scanned once per iteration plus the final
    // scoring pass — persist (caller owns cleanup, package contract)
    val xy = x.join(lab, "doc_id")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count().toDouble

    var w: IndexedSeq[Double] = Vector.fill(Dim)(0.0)
    var bias = 0.0
    // margins under the CURRENT model: m_d = Σ_b x_db·w_b + bias,
    // summed through exact decimals so partitioning can't reorder FP
    def margins: DataFrame = xy
      .groupBy(col("doc_id"), col("y"))
      .agg((xsum(col("x") * element_at(typedLit(w), col("b") + 1))
        + lit(bias)).as("m"))

    (1 to iters).foreach { _ =>
      // two actions (bucket gradients, bias gradient) read the same
      // per-doc errors: persist so the margin aggregation runs once per
      // iteration, and release immediately — both consumers are
      // driver-materialized before the update, so unlike the xy diamond
      // no returned plan can re-read this block
      val err = margins
        .select(col("doc_id"), (sig(col("m")) - col("y")).as("err"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val g = xy.join(err, "doc_id")
        .groupBy("b").agg(xsum(col("err") * col("x")).as("g"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val gBias = err.agg(xsum(col("err"))).head.getDouble(0)
      err.unpersist(blocking = false)
      // model update is driver-side IEEE arithmetic — 64+1 doubles of
      // bounded state, written to match the oracle's expression shape
      // operation for operation
      w = Vector.tabulate(Dim)(b => w(b) - lr * (g.getOrElse(b, 0.0) / nDocs))
      bias = bias - lr * (gBias / nDocs)
    }

    margins.select(col("doc_id"),
      col("y").cast("int").as("label"),
      sig(col("m")).as("score"),
      (sig(col("m")) >= lit(0.5)).cast("int").as("pred"))
  }
}
