package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's unified `Column` no longer exposes its catalyst expression
  * publicly; `classic.ExpressionUtils` holds the conversions but is
  * `private[sql]`. This bridge re-exports the two conversions from
  * inside the `org.apache.spark.sql` namespace — the standard extension
  * technique for libraries that build native `Expression`s (graft's
  * [[graft.functions.SortedBucket]] carries a driver-computed boundary
  * array, which no SQL-registry call string can sanely encode).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
