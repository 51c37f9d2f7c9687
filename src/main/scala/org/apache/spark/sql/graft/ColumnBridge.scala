package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 hides the Expression-backed
  * Column constructor behind `private[sql]`; extension libraries that
  * ship native Catalyst expressions host this one-liner inside the sql
  * package (the conventional pattern) rather than reflecting.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** LogicalPlan → DataFrame bridge: Spark 4 keeps `Dataset.ofRows`
  * `private[sql]`; the MERGE command exec re-hosts its (already
  * analyzed) source plan as a DataFrame through this one-liner — the
  * same pattern the as-of/band builders above use inline. */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
