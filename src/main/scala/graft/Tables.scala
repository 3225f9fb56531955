package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver's parquet tables (see TESTDATA.md / FIXTURES.md).
  *
  * Plain `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning and predicate pushdown — every query should show its filters
  * in `PushedFilters` and only the referenced columns in `ReadSchema`.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = table("region")
  def nation: DataFrame = table("nation")
  def customer: DataFrame = table("customer")
  def supplier: DataFrame = table("supplier")
  def part: DataFrame = table("part")
  def orders: DataFrame = table("orders")
  def lineitem: DataFrame = table("lineitem")
  /** `events.ts` has changed physical type across driver data
    * generations — TIMESTAMP(NANOS) (which Spark 4 refuses to read as a
    * timestamp; the legacy conf reads the nanos as long) and plain
    * timestamp[us] with isAdjustedToUTC=false (which Spark 4 infers as
    * TIMESTAMP_NTZ). Normalize every generation to a session-zone
    * microsecond TimestampType so downstream windows/watermarks/joins
    * see one type.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.normalizeTs(table("events"))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Epoch-nanos long column → microsecond timestamp. MUST be the SQL
    * integral `div`: Column `/` promotes longs to double, and epoch
    * nanos (~1.7e18) exceed double's 2^53 exact range (ulp = 256 ns
    * there), which corrupts a large fraction of timestamps by 1 µs
    * after truncation.
    */
  def nanosToMicrosTimestamp(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"timestamp_micros($colName div 1000)")

  /** Schema-adaptive `ts` normalization: whatever physical type the
    * driver's current generator emitted, the engine sees a session-zone
    * microsecond TimestampType.
    *   - LongType: legacy TIMESTAMP(NANOS) read via nanosAsLong →
    *     integral div to micros.
    *   - TIMESTAMP_NTZ (timestamp[us], isAdjustedToUTC=false): cast to
    *     TimestampType — identity on the stored micros because the
    *     session time zone is pinned to UTC (GraftSession).
    *   - TimestampType: already normalized.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", nanosToMicrosTimestamp("ts"))
    case TimestampNTZType =>
      df.withColumn("ts", df("ts").cast(TimestampType))
    case TimestampType => df
    case other => throw new IllegalStateException(
      s"events.ts has unsupported type $other — extend Tables.normalizeTs")
  }
}
