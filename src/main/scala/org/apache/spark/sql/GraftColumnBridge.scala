package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the direct `Column(expr)` constructor and
  * `ExpressionUtils` private[sql]; this shim (in the sql package, the
  * standard pattern for Spark extension libraries) re-exposes exactly the
  * two conversions a custom-Expression library needs.
  */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
