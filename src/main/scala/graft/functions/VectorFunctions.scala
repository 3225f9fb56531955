package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen-friendly higher-order functions (SURVEY §2.7).
  *
  * All accumulation is strict left-to-right in double precision: the
  * result is bit-deterministic regardless of partitioning (array order is
  * row-local), which the oracle compare relies on. At 100 TB these
  * evaluate per-row inside the scan stage — no shuffle, no UDF
  * serialization boundary.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm, accumulated in double. */
  def l2Norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) =>
      acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity of two float-array columns — a native Catalyst
    * expression ([[graft.expressions.CosineSim]]) with the same strict
    * left-to-right double accumulation as the higher-order form, one
    * tight loop per row.
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.CosineSim(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}
