package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public `new Column(expr)` constructor; the blessed
  * converter (`org.apache.spark.sql.classic.ExpressionUtils`) is
  * private[sql]. This bridge lives inside the sql package namespace to
  * expose the two conversions custom Catalyst expressions need — the same
  * technique Spark extension libraries use. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unwrap a possibly `.desc`/`.asc`-wrapped sort column into its key
    * column and a descending flag. A `.desc` Column carries a
    * ColumnNode-level SortOrder that cannot be projected or codegen'd, so
    * operators that need the VALUE of a sort key (e.g. a map-side top-k
    * heap) must strip it first. */
  def sortKey(c: Column): (Column, Boolean) = c.node match {
    case so: org.apache.spark.sql.internal.SortOrder =>
      (Column(so.child),
        so.sortDirection == org.apache.spark.sql.internal.SortOrder.Descending)
    case _ => (c, false)
  }

  /** Temp-function registration on a live session (sessionState is
    * private[sql]). */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Analyzed logical plan of a DataFrame (queryExecution is private[sql]). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** DataFrame from a logical plan (Dataset.ofRows is private[sql]). */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
