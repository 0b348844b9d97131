package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `sessionState` is private[sql] in Spark 4; this shim (same pattern as
  * [[GraftColumnBridge]]) exposes the one call needed to register a
  * function on an ALREADY-BUILT session — the `SparkSessionExtensions`
  * path covers sessions created with the extensions conf.
  */
object GraftFunctionRegistryBridge {
  def register(spark: SparkSession, id: FunctionIdentifier, info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
}
