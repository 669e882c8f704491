package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the engine's custom Catalyst expressions and the public
  * `Column` API. Spark 4 routes `Column` through ColumnNodes and keeps the
  * Expression⇄Column converters (`classic.ExpressionUtils`) private[sql],
  * so extensions either register every function on a session (ordering
  * trap: analysis fails if a query is BUILT before registration) or host a
  * one-line accessor inside the sql package — the standard extension shim.
  * Only conversion lives here; all engine code stays in `graft.*`.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
