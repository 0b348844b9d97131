package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine similarity of two `array<float>` columns — the
  * THREE [[FloatVectorDot]] folds (a·b, a·a, b·b) fused into one loop
  * with three accumulators, plus the zero-norm null guard.
  *
  * Why fused: the composed form
  * `when(denom === 0, null).otherwise(dot(a,b) / denom)` references
  * `denom` in both the condition and the branch, and codegen's
  * common-subexpression elimination does NOT reach across conditional
  * branches — the norm dots ran TWICE per pair (measured 1.74× the
  * explicit three-dot projection at 400 k × 64-dim). One loop also
  * reads each array once instead of three times.
  *
  * Arithmetic is bit-for-bit the composed form's: each accumulator is
  * its own left-to-right double fold with ITS OWN bounds (a·a over
  * `len(a)`, b·b over `len(b)`, a·b over the min — exactly the three
  * separate [[FloatVectorDot]] calls), null elements skipped per
  * accumulator the same way, and `denom == 0 → null`, so a NaN
  * component still propagates NaN (never null) exactly as before.
  * Every oracle's `round(list_inner_product(q,c) / NULLIF(sqrt(...)
  * * sqrt(...), 0), …)` replay is unchanged.
  */
case class FloatVectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.firstFailure(
      KernelTypeChecks.expectArrayOf(prettyName, "a", left, org.apache.spark.sql.types.FloatType),
      KernelTypeChecks.expectArrayOf(prettyName, "b", right, org.apache.spark.sql.types.FloatType))

  override def dataType: DataType = DoubleType

  // zero-norm inputs yield null even when both arrays are non-null
  override def nullable: Boolean = true

  override def prettyName: String = "float_vector_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val la = x.numElements()
    val lb = y.numElements()
    val n = math.max(la, lb)
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      val ax = i < la && !x.isNullAt(i)
      val by = i < lb && !y.isNullAt(i)
      if (ax) { val v = x.getFloat(i).toDouble; aa += v * v }
      if (by) { val v = y.getFloat(i).toDouble; bb += v * v }
      if (ax && by) ab += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    val denom = math.sqrt(aa) * math.sqrt(bb)
    if (denom == 0.0) null else Double.box(ab / denom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val la = ctx.freshName("la")
      val lb = ctx.freshName("lb")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val ab = ctx.freshName("ab")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val av = ctx.freshName("av")
      val bv = ctx.freshName("bv")
      val denom = ctx.freshName("denom")
      s"""
         |int $la = $a.numElements();
         |int $lb = $b.numElements();
         |int $n = java.lang.Math.max($la, $lb);
         |double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $av = $i < $la && !$a.isNullAt($i);
         |  boolean $bv = $i < $lb && !$b.isNullAt($i);
         |  if ($av) { double v = (double) $a.getFloat($i); $aa += v * v; }
         |  if ($bv) { double v = (double) $b.getFloat($i); $bb += v * v; }
         |  if ($av && $bv) { $ab += (double) $a.getFloat($i) * (double) $b.getFloat($i); }
         |}
         |double $denom = java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb);
         |if ($denom == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $ab / $denom; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object FloatVectorCosine {
  def apply(a: Column, b: Column): Column =
    GraftColumnBridge.toColumn(
      FloatVectorCosine(GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b)))
}
