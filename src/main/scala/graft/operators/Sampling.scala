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

  /** Deterministic training-mixture resampling: replicate (weight > 1)
    * or thin (weight < 1) each source to its target epoch weight,
    * expressed in integer per-mille so the realized fraction is EXACT —
    * a source at 2500‰ yields floor(2.5·n) ± 1 rows with zero RNG state.
    * The fractional remainder is spread by `id % 1000` (systematic, not
    * random — reproducible across engines, runs, and cluster sizes).
    * Sources absent from the map keep weight 1000‰ (pass-through).
    *
    * Scale shape: per-row arithmetic + a row explosion by its own copy
    * count; no shuffle at all. Emitted copies carry `copy_idx` so a
    * downstream packer/shuffler can decorrelate epochs.
    */
  def mixtureUpsample(
      df: DataFrame, id: Column, source: Column,
      perMille: Map[String, Int]): DataFrame = {
    require(perMille.values.forall(_ >= 0), "weights must be >= 0")
    val w = perMille.foldLeft(lit(1000)) { case (els, (s, v)) =>
      when(source === s, lit(v)).otherwise(els)
    }
    val copies = floor(w.cast("long") / 1000).cast("long") +
      when(pmod(id, lit(1000)) < w % 1000, 1L).otherwise(0L)
    df.withColumn("_n", copies)
      .filter(col("_n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("_n") - 1)))
      .drop("_n")
  }
}
