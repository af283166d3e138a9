// Lives under org.apache.spark.sql so it can reach the private[sql]
// classic-Column helpers — the standard pattern for third-party Catalyst
// expression libraries on Spark 4 (Column no longer exposes its Expression).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Full ColumnNode → catalyst conversion. ExpressionUtils.expression only
    * WRAPS the node (ColumnNodeExpression, Unevaluable) — fine when the
    * expression lands in a plan the analyzer converts, but a
    * FunctionRegistry builder must return real catalyst nodes, or SQL calls
    * die at codegen with "Cannot generate code for columnnodeexpression". */
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)
}
