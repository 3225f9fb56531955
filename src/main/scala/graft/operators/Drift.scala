package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus slices — the data
  * QA gate a continuously-refreshed training corpus runs before a new
  * snapshot ships: has the VALUE distribution of a feed moved?
  * Reference capability analog: the windowed per-key aggregation
  * (`/root/reference/src/main/scala/SimpleStreamProcessor/Node.scala:262-307`)
  * — here the two windows are corpus slices and the statistic is
  * rank-based.
  *
  * The statistic is the Mann–Whitney U (Wilcoxon rank-sum) with
  * midranks for ties — RANK-based, so it needs no distributional
  * assumption and, unlike a t-test, no mean/variance of raw doubles;
  * and every quantity is exactly replayable: midranks are integer
  * halves (exact in binary and in DECIMAL(28,6)), U is an exact
  * difference, and the normal approximation z = (U − μ)/σ uses one
  * correctly-rounded sqrt (the IEEE-exact policy; no tie-correction
  * term, documented).
  *
  * Scale shape: one (key, value)-keyed aggregation with map-side
  * partials (ties collapse BEFORE ranking, so the per-key frame is
  * distinct-value-sized), one cumulative window partitioned BY KEY,
  * one final per-key aggregation. No global order, nothing
  * driver-side.
  */
object Drift {

  /** Order-insensitive exact sum of a double column (the decimal-cast
    * route, kept local — the operator layer never imports the query
    * layer).
    */
  private def dsum(c: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.types.DecimalType
    sum(c.cast(DecimalType(28, 6))).cast("double")
  }

  /** Rank-sum drift of `valueCol` between slice A (`inA`) and its
    * complement, per `key` group. Output: (key, n_a, n_b, u_a, u_b, z)
    * where u_a is slice A's Mann–Whitney U and z its normal
    * standardization — |z| ≳ 3 flags a moved distribution.
    */
  def rankSumDrift(
      df: DataFrame,
      key: String,
      valueCol: String,
      inA: org.apache.spark.sql.Column): DataFrame = {
    val byVal = df
      .select(col(key), col(valueCol).as("v"), inA.as("in_a"))
      .groupBy(col(key), col("v"))
      .agg(count(lit(1)).as("c"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"))
    val wCum = Window.partitionBy(col(key)).orderBy(asc("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val mid = byVal
      .withColumn("before", coalesce(sum(col("c")).over(wCum), lit(0L)))
      .withColumn("midrank",
        col("before").cast("double") +
          (col("c").cast("double") + lit(1.0)) / lit(2.0))
    val agg = mid.groupBy(col(key))
      .agg(sum(col("c_a")).as("n_a"),
        (sum(col("c")) - sum(col("c_a"))).as("n_b"),
        dsum(col("c_a").cast("double") * col("midrank")).as("r_a"))
    // every n_a/n_b product goes DOUBLE factor by factor: the LONG
    // products wrap silently past ~3e9 rows per key (n_a·n_b) or
    // ~1.7e6 (the z denominator's triple product) — exactly the
    // at-scale slices this audit is for; double multiplies are
    // IEEE-deterministic in both engines
    val nab = col("n_a").cast("double") * col("n_b").cast("double")
    agg
      .withColumn("u_a",
        col("r_a") - col("n_a").cast("double") *
          (col("n_a") + 1L).cast("double") / lit(2.0))
      .withColumn("u_b", nab - col("u_a"))
      .withColumn("z",
        // a key entirely inside one slice has sigma 0: NULL, not a
        // silent NaN — the consumer treats it as its own alarm
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise(
            (col("u_a") - nab / lit(2.0)) /
              sqrt(nab * (col("n_a") + col("n_b") + 1L).cast("double") /
                lit(12.0))))
      .select(col(key), col("n_a"), col("n_b"), col("u_a"), col("u_b"),
        col("z"))
  }

  /** Per-(key, bucket) chi-square drift contributions of `df` against
    * a FROZEN baseline count table — the streaming-legal drift
    * monitor: the baseline is an offline artifact (broadcast), each
    * incoming row joins its expected count BEFORE the one aggregation,
    * and the χ² contribution (observed − expected)²/expected is a
    * stateless post-aggregation projection. On a streaming frame this
    * runs in update mode with one state row per (key, bucket); a
    * bucket the baseline never saw emits a NULL contribution — the
    * new-bucket alarm. Output: (key, bucket, observed, expected,
    * contrib).
    */
  def chiSquareDrift(
      df: DataFrame,
      baseline: DataFrame,
      key: String,
      valueCol: String): DataFrame = {
    df.select(col(key),
      floor(col(valueCol)).cast("long").as("bucket"))
      .join(broadcast(baseline), Seq(key, "bucket"), "left")
      .groupBy(col(key), col("bucket"), col("expected"))
      .agg(count(lit(1)).as("observed"))
      .select(col(key), col("bucket"), col("observed"), col("expected"),
        ((col("observed") - col("expected")).cast("double") *
          (col("observed") - col("expected")).cast("double") /
          col("expected").cast("double")).as("contrib"))
  }

  /** The frozen baseline count table [[chiSquareDrift]] consumes:
    * per-(key, unit-bucket) counts of the reference slice.
    */
  def baselineCounts(
      df: DataFrame, key: String, valueCol: String): DataFrame =
    df.select(col(key),
      floor(col(valueCol)).cast("long").as("bucket"))
      .groupBy(col(key), col("bucket"))
      .agg(count(lit(1)).as("expected"))

  /** Clip monitor against FROZEN winsorization bounds — the
    * streaming-legal apply side of [[winsorizeBounds]]: the bounds are
    * an offline artifact (broadcast), every incoming row joins its
    * key's bounds BEFORE the one aggregation, and the output is the
    * per-key seen/below/above counts a clipping pass would act on.
    * Update mode, one state row per key. Output: (key, lo_bound,
    * hi_bound, n_seen, n_below, n_above).
    */
  def clipMonitor(
      df: DataFrame,
      bounds: DataFrame,
      key: String,
      valueCol: String): DataFrame =
    df.select(col(key), col(valueCol).as("v"))
      // LEFT join: a key the bounds artifact never saw must still emit
      // its row (NULL bounds = the new-feed alarm, the chiSquareDrift
      // convention) — an inner join would silently discard exactly the
      // unbounded feed a clip monitor exists to catch
      .join(broadcast(bounds), Seq(key), "left")
      .groupBy(col(key), col("lo_bound"), col("hi_bound"))
      .agg(count(lit(1)).as("n_seen"),
        sum(when(col("v") < col("lo_bound"), 1L).otherwise(0L))
          .as("n_below"),
        sum(when(col("v") > col("hi_bound"), 1L).otherwise(0L))
          .as("n_above"))

  /** Rank-based winsorization bounds per key: the clip values a
    * training pipeline applies to a heavy-tailed numeric feed. The
    * bounds are ORDER STATISTICS — the value at rank ⌈loPct·n/100⌉
    * (clamped ≥ 1) and at rank ⌈hiPct·n/100⌉ — not interpolated
    * percentiles, so they are exact and tie-stable in any engine.
    * Output: (key, n, lo_bound, hi_bound, n_below, n_above) with the
    * counts a clipping pass would modify.
    *
    * Scale shape: one key-partitioned window (rank + count over the
    * same partitioning), one per-key aggregation for the bounds, one
    * co-keyed join back for the clip counts — key-parallel
    * throughout.
    */
  def winsorizeBounds(
      df: DataFrame,
      key: String,
      valueCol: String,
      loPct: Int = 1,
      hiPct: Int = 99): DataFrame = {
    require(loPct >= 0 && hiPct <= 100 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 100, got $loPct/$hiPct")
    val w = Window.partitionBy(col(key)).orderBy(asc("v"))
    val ranked = df.select(col(key), col(valueCol).as("v"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(key))))
    val bounds = ranked
      .withColumn("lo_k",
        greatest(lit(1L), expr(s"(n * $loPct + 99) DIV 100")))
      .withColumn("hi_k", expr(s"(n * $hiPct + 99) DIV 100"))
      .groupBy(col(key), col("n"))
      .agg(min(when(col("rn") === col("lo_k"), col("v"))).as("lo_bound"),
        min(when(col("rn") === col("hi_k"), col("v"))).as("hi_bound"))
    df.select(col(key), col(valueCol).as("v"))
      .join(bounds, key)
      .groupBy(col(key), col("n"), col("lo_bound"), col("hi_bound"))
      .agg(sum(when(col("v") < col("lo_bound"), 1L).otherwise(0L))
        .as("n_below"),
        sum(when(col("v") > col("hi_bound"), 1L).otherwise(0L))
          .as("n_above"))
      .select(key, "n", "lo_bound", "hi_bound", "n_below", "n_above")
  }

  /** The streaming-legal half of the binned two-sample KS statistic:
    * per-(key, unit-bin) counts of slice A (`inA`) and its complement
    * in ONE aggregation — on a streaming frame this runs in update
    * mode with one state row per (key, bin), and both carried sums
    * are order-insensitive exact integers. Output: (key, bin, ca, cb).
    */
  def ksBinCounts(
      df: DataFrame,
      key: String,
      valueCol: String,
      inA: org.apache.spark.sql.Column): DataFrame =
    // NULL values are OUT of the distribution, explicitly: a NULL bin
    // row would sort NULLS FIRST in ksFromBinCounts' cumulative window
    // (Spark default) but NULLS LAST in the DuckDB oracle, shifting
    // every ECDF step. The oracle pins the same filter.
    df.filter(col(valueCol).isNotNull)
      .select(col(key),
      floor(col(valueCol)).cast("long").as("bin"), inA.as("in_a"))
      .groupBy(col(key), col("bin"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))

  /** The report half: binned ECDFs via one key-partitioned cumulative
    * window over the (key, bin) counts, D = max |F_a − F_b| over bin
    * edges, and the α = 0.05 large-sample critical value
    * 1.358·√((n_a+n_b)/(n_a·n_b)). A key entirely inside one slice
    * yields NULL ks/crit/drifted (the rankSumDrift convention — its
    * own alarm, never a silent Infinity). Exactness: cumulative and
    * total counts are exact BIGINTs; every double is a fixed-shape
    * expression over them (one correctly-rounded sqrt), and MAX over
    * identical per-bin doubles is order-independent. Output: (key,
    * n_a, n_b, n_bins, ks_stat, crit_05, drifted).
    */
  def ksFromBinCounts(binned: DataFrame, key: String): DataFrame = {
    val wc = Window.partitionBy(col(key)).orderBy(asc("bin"))
    val wAll = Window.partitionBy(col(key))
    val cum = binned
      .withColumn("cum_a", sum(col("ca")).over(wc))
      .withColumn("cum_b", sum(col("cb")).over(wc))
      .withColumn("n_a", sum(col("ca")).over(wAll))
      .withColumn("n_b", sum(col("cb")).over(wAll))
      .withColumn("gap",
        when(col("n_a") > 0L && col("n_b") > 0L,
          abs(col("cum_a").cast("double") / col("n_a").cast("double") -
            col("cum_b").cast("double") / col("n_b").cast("double"))))
    val bothPos = col("n_a") > 0L && col("n_b") > 0L
    val crit = lit(1.358) * sqrt(
      (col("n_a") + col("n_b")).cast("double") /
        (col("n_a") * col("n_b")).cast("double"))
    cum.groupBy(col(key))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("n_bins"), max(col("gap")).as("ks_stat"))
      .withColumn("crit_05", when(bothPos, crit))
      .withColumn("drifted",
        when(bothPos, col("ks_stat") > col("crit_05")))
      .select(col(key), col("n_a"), col("n_b"), col("n_bins"),
        col("ks_stat"), col("crit_05"), col("drifted"))
  }

  /** Binned squared Hellinger distance of `valueCol` between slice A
    * (`inA`) and its complement, per key — the MASS-overlap companion
    * of [[ksDrift]] (KS reads the worst ECDF gap, most sensitive to a
    * single region; Hellinger integrates disagreement over ALL bins,
    * so many small shifts register even when no single gap does).
    * H² = 1 − BC with the Bhattacharyya coefficient
    * BC = Σ_i √(ca_i·cb_i) / √(n_a·n_b).
    *
    * Exactness: per-bin counts are exact BIGINTs from the SAME
    * [[ksBinCounts]] half the KS family composes (one definition of
    * the binning); each per-bin term is ONE correctly-rounded sqrt of
    * an exact integer product, the cross-bin sum routes through
    * DECIMAL(38,12) (order-insensitive — the n68 full-precision-double
    * policy), and the final form is a fixed shape over the decimal sum
    * — engine-exact, no transcendentals (the reason this is Hellinger
    * and not PSI/JSD, whose logs are not cross-engine bit-exact).
    * A key entirely inside one slice yields NULL bc/hellinger_sq (the
    * rankSumDrift convention). Output: (key, n_a, n_b, n_bins, bc,
    * hellinger_sq).
    *
    * Scale shape: [[ksBinCounts]]'s one keyed aggregation, then one
    * per-key fold over the distinct-bin-sized frame — key-parallel,
    * no window at all (unlike KS, Hellinger needs no cumulative
    * order).
    */
  def hellingerDrift(
      df: DataFrame,
      key: String,
      valueCol: String,
      inA: org.apache.spark.sql.Column): DataFrame =
    hellingerFromBinCounts(ksBinCounts(df, key, valueCol, inA), key)

  /** The Hellinger report half over a (key, bin, ca, cb) count frame —
    * the [[ksFromBinCounts]] pattern, so the batch query (n116) and
    * the streaming monitor (s35) share one definition of the
    * statistic over the SAME streamed state shape s33 carries.
    */
  def hellingerFromBinCounts(binned: DataFrame, key: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val bcSum = sum(sqrt((col("ca") * col("cb")).cast("double"))
      .cast(DecimalType(38, 12)))
    val agg = binned.groupBy(col(key))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        count(lit(1)).as("n_bins"), bcSum.as("bc_sum"))
    val bothPos = col("n_a") > 0L && col("n_b") > 0L
    agg
      .withColumn("bc",
        when(bothPos, col("bc_sum").cast("double") /
          sqrt((col("n_a") * col("n_b")).cast("double"))))
      .withColumn("hellinger_sq", when(bothPos, lit(1.0) - col("bc")))
      .select(col(key), col("n_a"), col("n_b"), col("n_bins"),
        col("bc"), col("hellinger_sq"))
  }

  /** Robust outlier bounds per key: median ± c·MAD (median absolute
    * deviation) — the heavy-tail-immune companion of
    * [[winsorizeBounds]] (whose P1/P99 ranks are themselves dragged by
    * the tail they bound; MAD is rank-central, so one corrupt feed
    * day cannot widen its own gate). Both statistics are ORDER
    * STATISTICS — the lower median, the value at rank ⌈n/2⌉ = (n+1)
    * DIV 2 — so they are exact data values, tie-stable in any engine;
    * the only arithmetic is |v − med| (one IEEE op per row) and
    * med ± c·mad (two fixed-shape IEEE ops), all single-rounded
    * identically in both engines. Output: (key, n, med, mad,
    * lo_bound, hi_bound, n_below, n_above).
    *
    * Scale shape: two windows partitioned BY KEY (value ranks, then
    * deviation ranks) and two co-keyed joins back — key-parallel
    * throughout, the winsorizeBounds shape run twice.
    *
    * NULL values are declared OUT of the order statistics (the
    * ksBinCounts/lengthPercentiles convention, and what the n117
    * oracle's WHERE value IS NOT NULL pins): Spark windows rank NULLS
    * FIRST, DuckDB NULLS LAST, so an unfiltered NULL would shift
    * rn/n/med/mad on the operator side only.
    */
  def madBounds(
      df: DataFrame,
      key: String,
      valueCol: String,
      c: Double = 3.0): DataFrame = {
    require(c > 0, s"need c > 0, got $c")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(key), col(valueCol).as("v"))
    val w = Window.partitionBy(col(key)).orderBy(asc("v"))
    val med = vals
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(key))))
      .groupBy(col(key), col("n"))
      .agg(min(when(col("rn") === expr("(n + 1) DIV 2"), col("v")))
        .as("med"))
    val wd = Window.partitionBy(col(key)).orderBy(asc("d"))
    val mad = vals.join(med, key)
      .withColumn("d", abs(col("v") - col("med")))
      .withColumn("rn", row_number().over(wd))
      .groupBy(col(key), col("n"), col("med"))
      .agg(min(when(col("rn") === expr("(n + 1) DIV 2"), col("d")))
        .as("mad"))
    val bounds = mad
      .withColumn("lo_bound", col("med") - lit(c) * col("mad"))
      .withColumn("hi_bound", col("med") + lit(c) * col("mad"))
    vals.join(bounds, key)
      .groupBy(col(key), col("n"), col("med"), col("mad"),
        col("lo_bound"), col("hi_bound"))
      .agg(sum(when(col("v") < col("lo_bound"), 1L).otherwise(0L))
        .as("n_below"),
        sum(when(col("v") > col("hi_bound"), 1L).otherwise(0L))
          .as("n_above"))
      .select(key, "n", "med", "mad", "lo_bound", "hi_bound",
        "n_below", "n_above")
  }

  /** Binned two-sample Kolmogorov–Smirnov drift of `valueCol` between
    * slice A (`inA`) and its complement, per key — the
    * whole-distribution companion of [[rankSumDrift]] (which is most
    * sensitive to location shift; KS reacts to ANY CDF divergence,
    * shape included). Composition of the two halves above, so the
    * batch query and the streaming monitor share one definition of
    * each stage.
    *
    * Scale shape: one (key, bin)-keyed aggregation with map-side
    * partials (the frame collapses to distinct-bin size before any
    * window), one key-partitioned cumulative window, one final
    * per-key aggregate — key-parallel, no global order.
    */
  def ksDrift(
      df: DataFrame,
      key: String,
      valueCol: String,
      inA: org.apache.spark.sql.Column): DataFrame =
    ksFromBinCounts(ksBinCounts(df, key, valueCol, inA), key)

  /** One-sided CUSUM drift detection per key: alarms where the
    * cumulative upward deviation of `value` from the reference level
    * exceeds the decision threshold — the classic sequential
    * change-point statistic (Page 1954), which reacts to a sustained
    * small shift long before any windowed mean does. The recursion
    * S_i = max(0, S_{i−1} + (x_i − k)) is not window-expressible, but
    * its closed form IS: S_i = P_i − min(0, min_{j≤i} P_j) with P the
    * running sum of (x − k) — one prefix sum and one prefix min over
    * the same key-partitioned order.
    *
    * Exactness: values are scaled to integer micro-units via
    * `floor(value·10⁶)` (floor, not cast — Spark's double→long cast
    * truncates while DuckDB's rounds; floor-then-cast is identical in
    * both), so every prefix statistic is exact BIGINT arithmetic.
    *
    * Output per key: event count, alarm count, the FIRST alarm
    * timestamp (NULL when the statistic never crosses — the quiet-key
    * case), and the max CUSUM in micro-units.
    *
    * Scale shape: one window partition per key (two chained window
    * functions over the same shuffle), then a key-keyed aggregate —
    * key-parallel, no global order, state O(1) per row.
    */
  def cusumDrift(
      events: DataFrame,
      key: String,
      tsCol: String,
      valueCol: String,
      reference: Double,
      threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be > 0, got $threshold")
    val kMicro = math.floor(reference * 1e6).toLong
    val hMicro = math.floor(threshold * 1e6).toLong
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsCol), col("event_id"))
    val p = events
      .select(col(key), col(tsCol), col("event_id"),
        floor(col(valueCol) * lit(1000000.0)).cast("long").as("x"))
      .withColumn("p", sum(col("x") - lit(kMicro)).over(w))
    val s = p
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(w)))
    s.groupBy(key)
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("s") > hMicro, 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("s") > hMicro, col(tsCol))).as("first_alarm_ts"),
        max(col("s")).as("max_cusum_micro"))
  }
}
