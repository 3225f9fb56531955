package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling (SURVEY §2.7 adjunct): training-data
  * pipelines need samples that are exact, reproducible, and
  * engine-independent — `RAND()`-based sampling is none of those, and
  * Spark's `sampleBy` is seeded-random per row. Systematic sampling
  * (every k-th row of a total order within each stratum) gives exact
  * per-stratum fractions (⌈n_s / k⌉ rows) with zero RNG state.
  *
  * Scale shape: one window partitioned BY THE STRATUM — parallelism is
  * the stratum count × AQE splitting; no global order, no partition-less
  * window. For very low-cardinality strata at extreme scale, substitute
  * the stratum-restricted [[GlobalOrder.withGlobalIndex]] rank.
  */
object Sampling {

  /** Keep rows whose 1-based rank within their stratum (ordered by
    * `orderCol`) is ≡ 1 (mod k).
    */
  def stratifiedSystematic(
      df: DataFrame, stratum: Column, order: Column, k: Int): DataFrame = {
    require(k > 0, s"sampling interval must be > 0, got $k")
    val w = Window.partitionBy(stratum).orderBy(order)
    df.withColumn("_rk", row_number().over(w))
      .filter(pmod(col("_rk"), lit(k)) === 1)
      .drop("_rk")
  }
}
