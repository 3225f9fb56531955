package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns (SURVEY "hard parts": salting for hot keys).
  *
  * Salted aggregation splits each hot key across `saltFactor` reducers
  * with a random-but-deterministic per-row salt, partially aggregates on
  * (key, salt), then finishes on key alone. Both shuffles move only
  * aggregated rows; the hot key's input spreads over `saltFactor` tasks.
  * AQE's skew handling covers joins; aggregation skew needs this shape.
  */
object Skew {

  /** Two-stage salted sum/count aggregation. `valueCol` is summed
    * exactly (decimal) so salting can't perturb the result vs a plain
    * groupBy — the invariant the oracle checks.
    */
  def saltedAgg(df: DataFrame, keyCol: String, valueCol: String,
      saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(col(keyCol), monotonically_increasing_id()),
        lit(saltFactor.toLong)))
    val partial = salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .as("_sum"))
    partial
      .groupBy(col(keyCol))
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("sum_value"))
  }
}
