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
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    * read as a timestamp; read nanos as long and convert to a
    * microsecond TimestampType (lossless for this data — the generator
    * emits microsecond granularity).
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table("events").withColumn("ts", Tables.nanosToMicrosTimestamp("ts"))
  }
  def documents: DataFrame = table("documents")
  def embeddings: DataFrame = table("embeddings")
}

object Tables {
  /** Epoch-nanos long column → microsecond timestamp. MUST be the SQL
    * integral `div`: Column `/` promotes longs to double, and epoch
    * nanos (~1.7e18) exceed double's 2^53 exact range (ulp = 256 ns
    * there), which corrupts a large fraction of timestamps by 1 µs
    * after truncation.
    */
  def nanosToMicrosTimestamp(colName: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"timestamp_micros($colName div 1000)")
}
