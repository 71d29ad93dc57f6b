package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one sanctioned crossing between graft's native Catalyst
  * expressions and the public Column API: Spark 4 made the
  * Column↔Expression converters `private[sql]` (columnNodeSupport),
  * so expressions that cannot ride SQL registration — e.g.
  * [[graft.functions.UnigramViterbi]], whose piece table is a runtime
  * Scala constant — wrap through here. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
