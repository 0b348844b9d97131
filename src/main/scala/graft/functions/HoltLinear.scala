package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Codegen'd Holt double-exponential smoothing over ONE series' ordered
  * values: the (level, trend) fold
  *
  *   level₀ = x₀, trend₀ = 0
  *   levelᵢ = α·xᵢ + (1−α)·(levelᵢ₋₁ + trendᵢ₋₁)
  *   trendᵢ = β·(levelᵢ − levelᵢ₋₁) + (1−β)·trendᵢ₋₁
  *
  * returning struct(level, trend, forecast = level + trend) — the
  * one-step-ahead smoothed state per series (Holt 1957; the linear-trend
  * member of the exponential-smoothing family, cf. Hyndman & Athanasopoulos
  * FPP §8.2). A recursive fold has no window/aggregate form (each step
  * feeds the next), so SQL engines express it as a recursive CTE over
  * one row per step — per-SERIES sequential no matter the engine. Here
  * the fold is a compiled per-row kernel over the series' value array:
  * series are mutually independent, so the 100 TB shape is one exchange
  * to group each series' values and then embarrassing parallelism, with
  * per-series memory bounded by the series length (the same bound the
  * recursive-CTE form pays in its working table).
  *
  * IEEE exactness across engines: the kernel evaluates the recurrences
  * in EXACTLY the written operation order, with 1−α / 1−β computed
  * once as doubles — an oracle that writes the same expressions gets
  * bit-identical doubles. Choose dyadic α, β (0.5, 0.25, …) so a
  * hand-inlined `0.75` in SQL equals the kernel's `1.0 − 0.25`.
  *
  * Null elements are SKIPPED (≡ filtering nulls before grouping);
  * a null or empty array yields a null struct.
  */
case class HoltLinear(child: Expression, alpha: Double, beta: Double)
    extends UnaryExpression {

  require(alpha > 0.0 && alpha <= 1.0, "alpha must be in (0, 1]")
  require(beta >= 0.0 && beta <= 1.0, "beta must be in [0, 1]")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName: argument 'values' must be array<double>, got " +
            other.catalogString)
    }

  override def dataType: DataType = HoltLinear.schema

  override def nullable: Boolean = true

  override def prettyName: String = "holt_linear"

  override def nullSafeEval(input: Any): Any =
    HoltLinear.compute(input.asInstanceOf[ArrayData], alpha, beta)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("holtOut")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
       |org.apache.spark.sql.catalyst.InternalRow $out =
       |  graft.functions.HoltLinear.compute($c, $alpha, $beta);
       |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HoltLinear {

  val schema: StructType = StructType(Seq(
    StructField("level", DoubleType, nullable = false),
    StructField("trend", DoubleType, nullable = false),
    StructField("forecast", DoubleType, nullable = false)))

  def apply(values: Column, alpha: Double, beta: Double): Column =
    GraftColumnBridge.toColumn(
      HoltLinear(GraftColumnBridge.toExpression(values), alpha, beta))

  /** Null iff the array holds no non-null value. */
  def compute(values: ArrayData, alpha: Double, beta: Double): InternalRow = {
    val n = values.numElements()
    val oneMinusAlpha = 1.0 - alpha
    val oneMinusBeta = 1.0 - beta
    var level = 0.0
    var trend = 0.0
    var seen = false
    var i = 0
    while (i < n) {
      if (!values.isNullAt(i)) {
        val x = values.getDouble(i)
        if (!seen) { level = x; trend = 0.0; seen = true }
        else {
          val next = alpha * x + oneMinusAlpha * (level + trend)
          trend = beta * (next - level) + oneMinusBeta * trend
          level = next
        }
      }
      i += 1
    }
    if (!seen) null
    else InternalRow(level, trend, level + trend)
  }
}
