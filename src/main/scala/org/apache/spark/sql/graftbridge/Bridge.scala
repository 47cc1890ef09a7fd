package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the sql-private Column ⇄ Expression conversions
  * (Spark 4 moved Column onto ColumnNode; ExpressionUtils is the
  * supported classic-session path but is private[sql], so extension
  * libraries expose it via a bridge in the sql package — the standard
  * pattern for custom-Expression libraries).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
