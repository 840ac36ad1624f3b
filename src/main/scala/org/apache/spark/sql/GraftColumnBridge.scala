package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column↔Expression bridges `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); custom Catalyst
  * expressions still need them to expose a Column API. This is the
  * one sanctioned-package-escape in the codebase, kept to two
  * one-line delegates.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
