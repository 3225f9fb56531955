package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge. Spark 4 removed the public
  * `new Column(expr)` constructor; the supported path for libraries
  * shipping custom expressions is `classic.ExpressionUtils`, which is
  * `private[sql]` — hence this one-file subpackage shim (the standard
  * extension-library pattern).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
