package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
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
