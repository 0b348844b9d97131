package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Codegen'd PQ ADC scoring: `codes` (a vector's m codebook cell ids)
  * indexed into `lut` (one query's m × maxCell partial-dot table),
  * summed EXACTLY — the fused form of "m lookups + exact sum" that
  * scores a corpus row against a query with no row explosion, no join,
  * and no aggregate.
  *
  * Exactness without decimals: LUT entries are 6dp-rounded doubles by
  * contract ([[graft.operators.Similarity.pqAdcTopK]] rounds each
  * partial dot to 6 before building the table), so `entry × 1e6` is
  * within half an ulp of an exact integer and `Math.round` recovers it
  * exactly (any |entry| < 2⁴⁶ holds far beyond real dot magnitudes).
  * The micro-units accumulate in LONG — associative, order-independent
  * — and the final division by 1e6 is a single correctly-rounded
  * double op, so the result is bit-identical to summing
  * `CAST(entry AS DECIMAL(28,12))` and casting back to double, which
  * is exactly what the DuckDB oracle computes.
  *
  * An out-of-range code, a code with no LUT row, or a NULL
  * code/row/entry yields NULL — misuse (codes from a different
  * codebook than the LUT) surfaces instead of scoring a silent 0.
  */
case class CodeLutSum(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    KernelTypeChecks.firstFailure(
      KernelTypeChecks.expectArrayOf(prettyName, "codes", left, IntegerType),
      right.dataType match {
        case ArrayType(ArrayType(DoubleType, _), _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName: argument 'lut' must be array<array<double>>, " +
            s"got ${other.simpleString}")
      })

  override def dataType: DataType = DoubleType

  // nullable even over non-null inputs: out-of-range / null elements
  // yield null (see class doc) — codegen must own a real isNull slot
  override def nullable: Boolean = true

  override def prettyName: String = "code_lut_sum"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), lut.numElements())
    var sum = 0L
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s) || lut.isNullAt(s)) return null
      val row = lut.getArray(s)
      val c = codes.getInt(s)
      if (c < 0 || c >= row.numElements() || row.isNullAt(c)) return null
      sum += Math.round(row.getDouble(c) * 1e6)
      s += 1
    }
    sum / 1e6
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      val sum = ctx.freshName("sum")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $sum = 0L;
         |boolean $bad = false;
         |for (int $s = 0; $s < $m; $s++) {
         |  if ($a.isNullAt($s) || $b.isNullAt($s)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $row = $b.getArray($s);
         |  int $c = $a.getInt($s);
         |  if ($c < 0 || $c >= $row.numElements() || $row.isNullAt($c)) {
         |    $bad = true; break;
         |  }
         |  $sum += java.lang.Math.round($row.getDouble($c) * 1e6);
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $sum / 1e6;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CodeLutSum {
  def apply(codes: Column, lut: Column): Column =
    GraftColumnBridge.toColumn(
      CodeLutSum(GraftColumnBridge.toExpression(codes), GraftColumnBridge.toExpression(lut)))
}
