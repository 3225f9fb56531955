package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy gates over event-shaped feeds — the release check a
  * training-data snapshot runs beside PII scrubbing
  * ([[TextAnalysis.scrubPii]]): redaction removes direct identifiers,
  * k-anonymity bounds what the remaining QUASI-identifiers re-identify.
  * Reference capability analog: the keyed aggregation
  * (`/root/reference/src/main/scala/SimpleStreamProcessor/Node.scala:262-307`).
  */
object Privacy {

  /** k-anonymity equivalence classes: group the feed by the
    * quasi-identifier columns and flag every class smaller than `k` —
    * records in a flagged class are re-identifiable by their
    * quasi-identifiers alone and must be suppressed or generalized
    * before release. Output: one row per class with its size, the
    * verdict, and the row count a suppression pass would drop.
    *
    * Scale shape: ONE hash aggregation with map-side partials over the
    * quasi-identifier key; class count is bounded by the key domain,
    * never the corpus. Nothing driver-side.
    */
  def kAnonymityClasses(
      df: DataFrame, quasiIds: Seq[Column], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "need at least one quasi-identifier")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(quasiIds: _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("anonymous", col("class_size") >= k)
      .withColumn("suppressed_rows",
        when(col("class_size") < k, col("class_size")).otherwise(lit(0L)))
  }
}
