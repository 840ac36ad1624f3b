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

  /** Dataset-from-LogicalPlan (`Dataset.ofRows` went `private[sql]`
    * with the Column bridges) — needed to hand a custom logical
    * operator ([[graft.plans.AsofJoinPlan]]) to the session.
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
