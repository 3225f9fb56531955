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
  * model, batch gradient descent trained INSIDE the engine. The model
  * splits batch-train from apply ([[trainModel]] / [[scoreWith]]) so a
  * STREAMING corpus can be gated by an offline-trained model with the
  * identical scoring arithmetic (the s19 DSIR production shape).
  *
  * Everything is engineered for cross-engine FP exactness so the whole
  * training trajectory sits under the DuckDB hash oracle:
  *   - features are md5-derived 64-bucket hashes (the n63 portable-hash
  *     precedent — ascii arithmetic on hex digits, no engine-native
  *     hash); margins and gradients are TOKEN-level sums
  *     (Σ_tokens w_b(t)/n_d rather than Σ_buckets x_db·w_b), which
  *     keeps scoring to ONE aggregation — legal in a streaming query,
  *     where chained stateful aggregations are not;
  *   - the squashing function is the "fast sigmoid"
  *     σ(m) = 0.5 + (0.5·m)/(1+|m|) — only +,·,/,abs, all IEEE-exact,
  *     no libm `exp` (whose last-ulp behavior differs across engines;
  *     same no-transcendentals policy as n42/n61);
  *   - every FP aggregation routes through DECIMAL(38,12) — exact,
  *     order-free addition — and back to double, with the oracle
  *     VARCHAR-routing BOTH casts ([[graft.queries.Sql.oSum12]]: Spark
  *     rounds the double's shortest string, DuckDB's direct cast
  *     rounds the full binary expansion, and at scale 12 they have
  *     been observed to disagree).
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

  /** Fast sigmoid — IEEE-exact squashing (no exp). */
  private[operators] def sig(m: Column): Column =
    lit(0.5) + (lit(0.5) * m) / (lit(1.0) + abs(m))

  /** Exact order-free double sum (DECIMAL(38,12) route). */
  private[operators] def xsum(c: Column): Column =
    sum(c.cast(DecimalType(38, 12))).cast("double")

  /** The SAME margin Σ w_b(t)/n as ONE native per-row expression over
    * raw text (normalization composed here, exactly as [[tokenBuckets]])
    * — bit-identical to `xsum(termCol(w))` over the exploded token
    * frame (see [[graft.expressions.TokenBucketMargin]]'s exactness
    * contract), without the explode, the per-token md5 hex string, or
    * the per-doc aggregation. Null text yields null; callers filter,
    * matching the explode path where null-text docs had no token rows.
    */
  private[operators] def marginCol(text: Column, w: IndexedSeq[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.TokenBucketMargin(
      ColumnBridge.expression(normalized(text)), w))
  }

  /** Per-document training feature frame: (doc_id, y, counts, n) with
    * counts the 64-slot bucket histogram
    * ([[graft.expressions.TokenBucketCounts]]) and n its element sum
    * (= the doc's token count). One row per DOC where the r15 frame
    * held one row per TOKEN (~100× smaller persisted state, no label
    * join — y is a per-row expression), computed in one scan-stage
    * pass. Null-text docs are filtered, matching the explode path.
    */
  private def countsFrame(
      docs: DataFrame, positiveSources: Seq[String]): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        when(col("source").isin(positiveSources: _*), lit(1.0))
          .otherwise(lit(0.0)).as("y"),
        ColumnBridge.column(graft.expressions.TokenBucketCounts(
          ColumnBridge.expression(normalized(col("text"))))).as("counts"))
      .withColumn("n", aggregate(col("counts"), lit(0), (a, x) => a + x))
  }

  /** Per-doc (doc_id, counts, n) bucket-histogram frame — the unlabeled
    * face of [[countsFrame]], shared with the Bradley–Terry trainer's
    * pair-side frame.
    */
  private[operators] def docCounts(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        ColumnBridge.column(graft.expressions.TokenBucketCounts(
          ColumnBridge.expression(normalized(col("text"))))).as("counts"))
      .withColumn("n", aggregate(col("counts"), lit(0), (a, x) => a + x))
  }

  /** The margin over a counts row ([[graft.expressions.BucketCountMargin]]
    * — bit-identical to `xsum(termCol(w))` over the exploded frame).
    */
  private def bucketMarginCol(counts: Column, w: IndexedSeq[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.BucketCountMargin(
      ColumnBridge.expression(counts), w))
  }

  /** Train `iters` full-batch gradient steps on `docs` (positive class
    * = `positiveSources`) and return the model: 64 weights + bias.
    * Bounded driver state by construction; the training diamond is
    * released before returning (the model is driver-materialized, no
    * returned plan can re-read it — [[Tokenizer.bpeTrainMerges]]
    * policy).
    */
  def trainModel(
      docs: DataFrame,
      positiveSources: Seq[String],
      iters: Int = 3,
      lr: Double = 1.0): (IndexedSeq[Double], Double) = {
    val xy = countsFrame(docs, positiveSources)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val out = trainOn(xy, docs.count().toDouble, iters, lr)
    xy.unpersist(blocking = false)
    out
  }

  /** Train + derive the in-stream gate threshold (min score of the
    * batch top `frac` — s19's offline-threshold rule) in one pass over
    * a SHARED persisted feature frame: training, final margins and the
    * rank all read the same tokenize+md5 scan instead of re-deriving
    * it per stage. Returns (weights, bias, threshold); all three are
    * driver-materialized, so the feature diamond is released before
    * returning.
    */
  def trainGate(
      docs: DataFrame,
      positiveSources: Seq[String],
      frac: Double,
      iters: Int = 3,
      lr: Double = 1.0): (IndexedSeq[Double], Double, Double) = {
    require(frac > 0.0 && frac <= 1.0, s"frac must be in (0,1], got $frac")
    val xy = countsFrame(docs, positiveSources)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nDocs = docs.count()
    val (w, bias) = trainOn(xy, nDocs.toDouble, iters, lr)
    val k = math.ceil(frac * nDocs).toLong
    val thr = gateThresholdFrame(xy, w, bias, k).head.getDouble(0)
    xy.unpersist(blocking = false)
    (w, bias, thr)
  }

  /** The threshold plan over raw docs with a zero model — the exact
    * frame shape [[trainGate]] executes, buildable by PlanQualitySpec
    * without running the training loop.
    */
  private[graft] def gateThresholdPlan(
      docs: DataFrame, positiveSources: Seq[String], k: Long): DataFrame =
    gateThresholdFrame(
      countsFrame(docs, positiveSources),
      Vector.fill(Dim)(0.0), 0.0, k)

  /** Threshold = min score of the global top-k, derived DISTRIBUTED:
    * range-partitioned global rank + filter ([[GlobalOrder]]), never a
    * single-point TakeOrderedAndProject gather of k ∝ corpus rows (the
    * s19 shape, [[Sampling.dsirTrainGate]]). Exposed as a frame so
    * PlanQualitySpec can assert the plan carries no global limit — the
    * class of scale defect an eagerly-executed operator interior would
    * otherwise hide from registry-wide plan audits.
    */
  private[graft] def gateThresholdFrame(
      xy: DataFrame, w: IndexedSeq[Double], bias: Double,
      k: Long): DataFrame = {
    val scored = xy
      .select(col("doc_id"),
        (bucketMarginCol(col("counts"), w) + lit(bias)).as("m"))
      .select(col("doc_id"), sig(col("m")).as("score"))
    GlobalOrder
      .withGlobalIndexCols(scored, Seq(desc("score"), asc("doc_id")))
      .filter(col("_global_rank") <= k)
      .agg(min(col("score")))
  }

  /** The gradient loop over a prepared (doc_id, n, b, y) frame —
    * shared by [[trainModel]], [[trainGate]] and
    * [[trainedQualityScores]], whose persisted feature frames differ
    * only in lifetime. Margins grouped by (doc_id, y) sum the same
    * per-token terms as any other grouping of the same rows — decimal
    * addition is order- and grouping-free, which is what lets every
    * caller share one definition.
    */
  private def trainOn(
      xy: DataFrame, nDocs: Double, iters: Int,
      lr: Double): (IndexedSeq[Double], Double) = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    var w: IndexedSeq[Double] = Vector.fill(Dim)(0.0)
    var bias = 0.0
    (1 to iters).foreach { _ =>
      // margins under the CURRENT model, then per-doc errors; the two
      // gradient actions below both read err, so persist it for the
      // iteration and release before the update (both consumers are
      // driver-materialized first)
      val err = xy
        .select(col("counts"), col("n"),
          (bucketMarginCol(col("counts"), w) + lit(bias)).as("m"), col("y"))
        .select(col("counts"), col("n"),
          (sig(col("m")) - col("y")).as("err"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // per-bucket gradient: the per-token decimal terms dec12(err/n)
      // collapse to one multiply by the doc's bucket count —
      // (26,12) x (10,0) -> (37,12) is exact, the (38,12) sum is exact,
      // so the value equals the exploded xsum(err/n) bit for bit.
      // (10,0), not (6,0): a >= 10^6-token document would NULL a (6,0)
      // cast silently under non-ANSI semantics and drop its gradient
      // term (r16 ADVICE); int counts always fit 10 digits
      val g = DriverModel.collectBounded(
        err
          .select(col("err"), col("n"),
            posexplode(col("counts")).as(Seq("b", "c")))
          .filter(col("c") > 0)
          .groupBy("b")
          .agg(sum((col("err") / col("n").cast("double"))
              .cast(DecimalType(26, 12)) * col("c").cast(DecimalType(10, 0)))
            .cast("double").as("g")),
        "QualityModel gradient", maxRows = Dim)
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val gBias = err.agg(xsum(col("err"))).head.getDouble(0)
      err.unpersist(blocking = false)
      // model update is driver-side IEEE arithmetic — 64+1 doubles of
      // bounded state, written to match the oracle's expression shape
      // operation for operation
      w = Vector.tabulate(Dim)(b => w(b) - lr * (g.getOrElse(b, 0.0) / nDocs))
      bias = bias - lr * (gBias / nDocs)
    }
    (w, bias)
  }

  /** Score any (doc_id, text) frame — batch OR streaming — with a
    * trained model: (doc_id, score, pred). ONE stateless per-row
    * expression ([[marginCol]]) — a streaming caller pays no
    * aggregation state at all (the r15 form kept one state row per
    * doc); the arithmetic is the training margin's, token for token,
    * bit-identical to the exploded formulation. Assumes unique doc_id
    * rows (the corpus contract; the old groupBy would have merged
    * duplicate ids into one score).
    */
  def scoreWith(
      docs: DataFrame, w: IndexedSeq[Double], bias: Double): DataFrame = {
    require(w.size == Dim, s"weight vector must have $Dim entries")
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), (marginCol(col("text"), w) + lit(bias)).as("m"))
      .select(col("doc_id"), sig(col("m")).as("score"),
        (sig(col("m")) >= lit(0.5)).cast("int").as("pred"))
  }

  /** Batch train-and-score: every document labeled and scored by the
    * final model. Output: (doc_id, label, score, pred). Training and
    * the final scoring pass share ONE persisted feature frame (the
    * diamond contract — the block stays alive for the returned plan,
    * caller owns cleanup).
    */
  def trainedQualityScores(
      docs: DataFrame,
      positiveSources: Seq[String],
      iters: Int = 3,
      lr: Double = 1.0): DataFrame = {
    val xy = countsFrame(docs, positiveSources)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (w, bias) = trainOn(xy, docs.count().toDouble, iters, lr)
    val out = xy.select(col("doc_id"), col("y"),
        (bucketMarginCol(col("counts"), w) + lit(bias)).as("m"))
      .select(col("doc_id"), col("y").cast("int").as("label"),
        sig(col("m")).as("score"),
        (sig(col("m")) >= lit(0.5)).cast("int").as("pred"))
    graft.DiamondCaches.register(xy, out)
  }

  /** Calibration (reliability) table of the trained classifier by
    * score RANK decile: bin the corpus into `bins` equal-population
    * buckets of the score ordering (bin 0 = highest scores) and report
    * per bin the population, the positive share, and the exact-decimal
    * mean score. Rank-based binning is the form that stays informative
    * whatever the score scale — the fast-sigmoid margins concentrate
    * in a narrow band, where equal-WIDTH bins would collapse to one
    * row; what matters for a gate is whether the positive rate falls
    * monotonically with rank. Output: (bin, n_docs, n_pos, avg_score,
    * pos_rate).
    *
    * Scale shape: training as [[trainedQualityScores]]; the rank is
    * [[GlobalOrder]]'s distributed range-partitioned sort (never a
    * partition-less window), the corpus count a broadcast one-row
    * scalar, the table ONE bins-sized hash aggregation.
    */
  def calibrationBins(
      docs: DataFrame,
      positiveSources: Seq[String],
      iters: Int = 3,
      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"bins must be >= 2, got $bins")
    val scored = trainedQualityScores(docs, positiveSources, iters)
    val n = scored.agg(count(lit(1)).as("n_all"))
    GlobalOrder
      .withGlobalIndexCols(scored, Seq(desc("score"), asc("doc_id")))
      .withColumnRenamed("_global_rank", "rk")
      .crossJoin(broadcast(n))
      .withColumn("bin", expr(s"((rk - 1) * $bins) DIV n_all").cast("int"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("label").cast("long")).as("n_pos"),
        (xsum(col("score")) / count(lit(1)).cast("double"))
          .as("avg_score"))
      .withColumn("pos_rate",
        col("n_pos").cast("double") / col("n_docs").cast("double"))
  }

  /** Split-conformal gate threshold (Vovk et al.; the Angelopoulos &
    * Bates 2021 tutorial form): instead of a hand-picked cut (n126's
    * operating points) or a rank decile ([[calibrationBins]]), derive
    * the score threshold that keeps ≥ (1 − α) of TRUE positives with a
    * finite-sample guarantee — t = the k-th smallest calibration-
    * positive score with k = ⌊(n_cal + 1)·α⌋ — then report the gate's
    * realized recall/precision/pass-rate on the held-out split. The
    * split is deterministic (even doc_id calibrates, odd tests); α is
    * taken in per-mille so k is EXACT integer arithmetic. With fewer
    * than 1000/alphaPm calibration positives the bound is vacuous and
    * k clamps to 1 (the smallest score — keep-everything-ish), stated
    * rather than hidden. One output row.
    *
    * Exactness: the threshold is an order-statistic SELECTION on
    * hash-exact scores (ties by doc_id); every reported rate is a
    * single division of exact BIGINT counts.
    *
    * Scale shape: training as [[trainedQualityScores]]; the k-th
    * order statistic rides [[GlobalOrder]]'s range-partitioned sort
    * (never a single-task window); the threshold row broadcasts to
    * the test-split scan; one final one-row aggregation.
    */
  def conformalGate(
      docs: DataFrame,
      positiveSources: Seq[String],
      iters: Int = 3,
      alphaPm: Int = 100): DataFrame = {
    require(alphaPm >= 1 && alphaPm < 1000,
      s"alphaPm must be in [1, 999], got $alphaPm")
    val scored = trainedQualityScores(docs, positiveSources, iters)
    val cal = scored
      .filter(col("doc_id") % 2 === 0 && col("label") === 1)
    val nCal = cal.agg(count(lit(1)).as("n_cal_pos"))
    val thr = GlobalOrder
      .withGlobalIndexCols(cal, Seq(asc("score"), asc("doc_id")))
      .crossJoin(broadcast(nCal))
      .withColumn("k",
        greatest(expr(s"((n_cal_pos + 1) * $alphaPm) DIV 1000"), lit(1L)))
      .filter(col("_global_rank") === col("k"))
      .select(col("n_cal_pos"), col("k"), col("score").as("threshold"))
    scored
      .filter(col("doc_id") % 2 === 1)
      .crossJoin(broadcast(thr))
      .groupBy("n_cal_pos", "k", "threshold")
      .agg(count(lit(1)).as("n_test"),
        sum(col("label").cast("long")).as("n_test_pos"),
        sum(when(col("score") >= col("threshold"), 1L).otherwise(0L))
          .as("n_kept"),
        sum(when(col("score") >= col("threshold") && col("label") === 1, 1L)
          .otherwise(0L)).as("n_kept_pos"))
      .select(col("n_cal_pos"), col("k"), col("threshold"), col("n_test"),
        col("n_test_pos"), col("n_kept"), col("n_kept_pos"),
        // explicit null-on-zero: Spark's non-ANSI Divide yields NULL on
        // a zero denominator while DuckDB's IEEE double division yields
        // NaN — on a degenerate split (no test positives / nothing
        // kept) the two engines would hash-diverge unless both sides
        // state the NULL branch explicitly (oracle carries the same
        // CASE WHEN)
        when(col("n_test_pos") === 0, lit(null).cast("double"))
          .otherwise(
            col("n_kept_pos").cast("double") / col("n_test_pos").cast("double"))
          .as("recall_test"),
        when(col("n_kept") === 0, lit(null).cast("double"))
          .otherwise(
            col("n_kept_pos").cast("double") / col("n_kept").cast("double"))
          .as("precision_test"),
        (col("n_kept").cast("double") / col("n_test").cast("double"))
          .as("pass_rate"))
  }

  /** Confident-learning label-noise card (Northcutt, Jiang & Chuang,
    * JAIR 2021): estimate which WEAK LABELS the classifier itself
    * disbelieves. Per-class confidence thresholds are the mean
    * self-confidence of docs carrying that label (t₁ = mean score over
    * label 1, t₀ = mean (1−score) over label 0 — the paper's class
    * expected self-confidence); a doc is confidently class c when its
    * class-c confidence clears t_c (both clear → larger margin wins,
    * ties to class 1; neither → excluded, the paper's abstention). The
    * (given label × confident prediction) cell counts are the joint
    * estimate: off-diagonal mass is the label-noise estimate — the
    * "which source labels can I trust" card for n68's weak supervision
    * (this engine's labels ARE weak: source identity). Simplification
    * vs the paper, documented: confidences come from the full-corpus
    * fit rather than cross-validated out-of-sample scores (the n145
    * even/odd split shows the held-out variant; here the card reads
    * the trusted-label structure of the whole corpus).
    *
    * Exactness: threshold means are decimal-routed exact sums over
    * exact counts; every comparison is fixed-order IEEE double on both
    * engines. Output one row per surviving (label, y_hat) cell:
    * (label, y_hat, n, n_label, frac_of_label, is_clean), ordered.
    *
    * Scale shape: training as [[trainedQualityScores]]; the scored
    * frame persists (it feeds the threshold means, the per-label
    * totals AND the cell counts — the diamond rule); thresholds are a
    * broadcast one-row scalar; cells are one 4-row hash agg. Callers
    * run GraftSession.dropAllBlocks between queries (engine persist
    * contract).
    */
  def labelNoiseCells(
      docs: DataFrame,
      positiveSources: Seq[String],
      iters: Int = 3): DataFrame = {
    val scored = trainedQualityScores(docs, positiveSources, iters)
      .select(col("doc_id"), col("label"), col("score"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val thr = scored.agg(
      (xsum(when(col("label") === 1, col("score"))) /
        sum(when(col("label") === 1, 1L))).as("t1"),
      (xsum(when(col("label") === 0, lit(1.0) - col("score"))) /
        sum(when(col("label") === 0, 1L))).as("t0"))
    val nLab = scored.groupBy("label")
      .agg(count(lit(1)).as("n_label"))
    scored.crossJoin(broadcast(thr))
      .select(col("label"), col("score"), col("t1"), col("t0"),
        (lit(1.0) - col("score")).as("conf0"))
      .withColumn("y_hat",
        when(col("score") >= col("t1") && col("conf0") >= col("t0"),
          when(col("score") - col("t1") >= col("conf0") - col("t0"), 1)
            .otherwise(0))
          .when(col("score") >= col("t1"), 1)
          .when(col("conf0") >= col("t0"), 0))
      .filter(col("y_hat").isNotNull)
      .groupBy("label", "y_hat")
      .agg(count(lit(1)).as("n"))
      .join(broadcast(nLab), "label")
      .select(col("label"), col("y_hat"), col("n"), col("n_label"),
        (col("n").cast("double") / col("n_label").cast("double"))
          .as("frac_of_label"),
        (col("label") === col("y_hat")).as("is_clean"))
      .transform(graft.DiamondCaches.register(scored, _))
  }

}
