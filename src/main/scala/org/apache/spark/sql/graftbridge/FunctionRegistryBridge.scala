// Lives under org.apache.spark.sql to reach the private[sql] sessionState —
// same rationale as ColumnBridge: runtime function registration into an
// EXISTING session (the SparkSessionExtensions path only applies at session
// construction).
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

object FunctionRegistryBridge {
  def register(spark: SparkSession, name: String, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
