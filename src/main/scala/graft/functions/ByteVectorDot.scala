package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ByteType, DataType, LongType}

/** Codegen'd integer dot product of two `array<tinyint>` columns (the
  * int8-quantized embedding store), accumulated in LONG.
  *
  * The quantized-search twin of [[FloatVectorDot]]: replaces the
  * `aggregate(zip_with(...))` higher-order-function fold — interpreted
  * per element, whole-stage-codegen hostile — with a compiled loop.
  * Integer addition is associative, so the result is EXACTLY the HOF
  * fold's value and every oracle comparison is unaffected; overflow is
  * impossible for any real vector (|q| ≤ 127 ⇒ 127² per element needs
  * ~5·10¹⁴ elements to overflow a long).
  *
  * Element count is the min of the two lengths; null elements read
  * as 0 (quantized vectors are dense by construction).
  */
case class ByteVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.firstFailure(
      KernelTypeChecks.expectArrayOf(prettyName, "a", left, ByteType),
      KernelTypeChecks.expectArrayOf(prettyName, "b", right, ByteType))

  override def dataType: DataType = LongType

  override def prettyName: String = "byte_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        sum += x.getByte(i).toLong * y.getByte(i).toLong
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
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $sum += (long) $a.getByte($i) * (long) $b.getByte($i);
         |  }
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ByteVectorDot {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      ByteVectorDot(GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
