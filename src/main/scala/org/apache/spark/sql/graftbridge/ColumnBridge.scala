package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversion (Spark 4
  * moved Column onto ColumnNode; custom Catalyst expressions still need
  * Expression wrapping). Lives under org.apache.spark.sql so the
  * package-private API is visible — the standard technique for libraries
  * that extend Catalyst (cf. frameless / delta). Contains no logic. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
