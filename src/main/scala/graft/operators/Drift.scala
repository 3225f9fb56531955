package graft.operators

import graft.queries.Sql
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
        Sql.dsum(col("c_a").cast("double") * col("midrank")).as("r_a"))
    agg
      .withColumn("u_a",
        col("r_a") - (col("n_a") * (col("n_a") + 1L)).cast("double") / lit(2.0))
      .withColumn("u_b",
        (col("n_a") * col("n_b")).cast("double") - col("u_a"))
      .withColumn("z",
        (col("u_a") - (col("n_a") * col("n_b")).cast("double") / lit(2.0)) /
          sqrt((col("n_a") * col("n_b") *
            (col("n_a") + col("n_b") + 1L)).cast("double") / lit(12.0)))
      .select(col(key), col("n_a"), col("n_b"), col("u_a"), col("u_b"),
        col("z"))
  }
}
