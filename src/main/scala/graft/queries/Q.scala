package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One verifiable query: a Spark implementation plus (usually) an ANSI-SQL
  * oracle the driver runs through DuckDB on the same parquet tables.
  * Column names/order must match between the two (the driver sorts columns
  * by name before hashing values).
  */
final case class Q(
    name: String,
    doc: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def all: Seq[Q]
}

/** Helpers shared by query definitions.
  *
  * Floating-point policy for oracle parity: per-row double arithmetic is
  * bit-identical across engines (IEEE 754), but *aggregation order* is
  * not — `SUM(double)` differs in the last bits between Spark and DuckDB
  * (and between runs at different parallelism). So every double SUM/AVG
  * casts the per-row value to DECIMAL(28,6) first: decimal addition is
  * exact and associative, both engines produce the identical decimal, and
  * the final cast back to double is then deterministic. (A binary double
  * can never sit exactly on a 1e-7 rounding boundary, so the
  * double→decimal rounding is also engine-independent.)
  *
  * LIMIT: that last claim only holds when the per-row value has a SHORT
  * exact decimal form (prices, quantities — ≤ 6 dp). A quotient like
  * value/(k-50) is a full-precision binary double; Spark's double→
  * decimal cast goes through the SHORTEST string representation
  * (BigDecimal.valueOf) while DuckDB rounds the full binary expansion,
  * and near a .5 ulp at the 6th decimal they round apart (observed: one
  * row in 600k at sf0.1 — q49's original sum_ratio). Never dsum a
  * division result; aggregate quotients with order-independent
  * selections (min/max) or restructure to divide AFTER the exact sum.
  */
object Sql {
  /** Order-insensitive exact sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Exact average of a double column (exact sum / count), as double. */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double") / count(lit(1))

  /** DuckDB-side equivalent of [[dsum]]. The decimal→double cast goes
    * through VARCHAR: DuckDB's direct decimal→double converts the
    * scaled int128 to double and THEN divides by 10^scale (two
    * roundings), which can differ by 1 ulp from Spark's correctly
    * rounded BigDecimal→double once the scaled sum exceeds 2^53;
    * string→double parsing single-rounds on both engines.
    */
  def oSum(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS VARCHAR) AS DOUBLE)"

  /** DuckDB-side equivalent of [[davg]]. */
  def oAvg(expr: String): String =
    s"${oSum(expr)} / COUNT(*)"

  /** DuckDB-side exact sum of FULL-PRECISION doubles (quotients,
    * sigmoid outputs) at scale 12, VARCHAR-routed on BOTH casts. The
    * input-side route is the critical one: Spark's double→decimal cast
    * rounds the double's SHORTEST string representation (BigDecimal
    * .valueOf), DuckDB's direct cast rounds the full binary expansion —
    * near a half-ulp at the 12th decimal they round apart (observed:
    * n68's iteration-3 bias gradient, which shifted every score by
    * ~2e-15). Casting the double to VARCHAR first makes DuckDB round
    * the same shortest string Spark does (both parse it half-up).
    */
  def oSum12(expr: String): String =
    s"""CAST(CAST(SUM(CAST(CAST(($expr) AS VARCHAR)
          AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE)"""

  /** [[oSum12]] as a window aggregate over a named WINDOW clause —
    * the order-free exact sum per partition (n140's group moments).
    */
  def oSum12Over(expr: String, window: String): String =
    s"""CAST(CAST(SUM(CAST(CAST(($expr) AS VARCHAR)
          AS DECIMAL(38,12))) OVER $window AS VARCHAR) AS DOUBLE)"""

  /** DuckDB cosine between two list columns — the same strict
    * left-to-right double accumulation as VectorFunctions.cosine, so
    * values are bit-identical. Shared by every ANN oracle (n05/n12/n46
    * family and the n52 multi-table LSH) — one definition, or the
    * oracle families silently diverge on a cast change.
    */
  def oCos(a: String, b: String): String =
    s"""(list_reduce(list_transform(list_zip($a, $b),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, x) -> acc + x)
        / (sqrt(list_reduce(list_transform($a,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))
         * sqrt(list_reduce(list_transform($b,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, x) -> acc + x))))"""
}
