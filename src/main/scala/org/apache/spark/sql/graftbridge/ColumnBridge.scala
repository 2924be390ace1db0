package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Bridge to the `private[sql]` Column↔Expression converters and
  * Dataset constructor — the standard pattern for Catalyst extension
  * libraries on Spark 4.x (Column is ColumnNode-backed; raw
  * Expressions/LogicalPlans need the classic converters). Lives under
  * org.apache.spark.sql only for access; no Spark internals are
  * modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
