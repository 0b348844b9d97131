package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product of two `array<float>` columns, accumulated in
  * DOUBLE in element order.
  *
  * Replaces the `aggregate(zip_with(...))` higher-order-function fold on
  * the ANN hot path: HOFs evaluate per element through interpreted
  * lambda plumbing and break whole-stage codegen, while this compiles to
  * a tight primitive loop inside the generated code. The accumulation
  * order (left-to-right, double) is identical to the HOF fold, so
  * results are bit-for-bit unchanged — oracle comparisons are
  * unaffected.
  *
  * Element count is the min of the two lengths; null elements are
  * treated as 0 (embeddings are dense in practice).
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // SQL-reachable via GraftExtensions: getFloat over a non-float array
  // reads misaligned bytes — reject anything but array<float> at
  // analysis (ExpectsInputTypes' AbstractDataType is private[sql]).
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.firstFailure(
      KernelTypeChecks.expectArrayOf(prettyName, "a", left, org.apache.spark.sql.types.FloatType),
      KernelTypeChecks.expectArrayOf(prettyName, "b", right, org.apache.spark.sql.types.FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      }
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FloatVectorDot {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      FloatVectorDot(GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
