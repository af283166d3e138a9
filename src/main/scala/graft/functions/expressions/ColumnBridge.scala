// Lives under org.apache.spark.sql so it can reach the private[sql]
// classic-Column helpers — the standard pattern for third-party Catalyst
// expression libraries on Spark 4 (Column no longer exposes its Expression).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
