package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` plan-to-Dataset constructor, the standard
  * pattern libraries use to materialize a custom [[LogicalPlan]] node as a
  * DataFrame (cf. the `package object sql` type-alias shim Spark itself
  * ships). Kept to this single call so the internal surface we touch stays
  * one line wide.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column ↔ Catalyst Expression bridge (`classic.ExpressionUtils` is
    * `private[sql]`): lets a library expression like graft's DotFExpr wrap
    * directly into a Column with no session-registry round-trip, so
    * construction needs no active session and the plan resolves under
    * whichever session analyzes it. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
