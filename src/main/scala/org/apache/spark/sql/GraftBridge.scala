package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]` in Spark 4, so the one-line adapter lives in this
  * package — the standard pattern for libraries shipping custom
  * Catalyst expressions.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
