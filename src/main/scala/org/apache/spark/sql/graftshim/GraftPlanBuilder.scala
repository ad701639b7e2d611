package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one private[sql] doorway this library uses: turning a custom
  * LogicalPlan node into a DataFrame. Spark's own extension points
  * (SparkSessionExtensions) let libraries inject rules and strategies
  * but provide no public constructor from a LogicalPlan; every major
  * Spark extension ships a shim like this one.
  */
object GraftPlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (private[sql] accessor). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Column ↔ Expression bridge (private[sql] in Spark 4's classic
    * module) — lets library code build Columns over custom Catalyst
    * expressions without a per-session function-registry round-trip.
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
