package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Codegen'd Largest-Triangle-Three-Buckets downsampling of ONE series:
  * select `k` points that preserve the series' visual shape
  * (Steinarsson 2013 — the standard display-grade downsampler in
  * time-series databases). First and last points always survive; the
  * middle splits into k−2 equal-count buckets, and each bucket keeps
  * the point forming the largest triangle with the PREVIOUSLY KEPT
  * point and the NEXT bucket's average — a left-to-right greedy
  * recursion, so (like [[HoltLinear]]) it has no window/aggregate
  * form and SQL engines must unroll it step by step, while here it is
  * one compiled pass over the series' point array.
  *
  * Input: `array<struct<x: long, id: long, y: long>>`, ordered by
  * (x, id) — x in epoch µs, y in 6dp micro-units (quantize via
  * `cast(value as decimal(18,6)) * 1e6`, the cusum discipline). ALL
  * geometry runs on exact-integer-valued doubles (x < 2⁵³, y < 2⁵³
  * convert exactly; bucket-average sums accumulate in Long with a
  * BigInteger escape on overflow — epoch-µs sums overflow a signed
  * 64-bit at ~5,400 points per bucket — then take ONE round-to-nearest
  * conversion and ONE double division, matching an engine that sums in
  * 128-bit), so a replayed formula gets bit-identical areas and the
  * same argmax. Scale in x
  * or y shifts every area by a constant factor — argmax is
  * scale-invariant, so the µs/micro units never distort selection.
  *
  * Bucket b ∈ [0, k−2) covers middle indices
  * `[1 + b·(n−2) div (k−2), 1 + (b+1)·(n−2) div (k−2))` (integer
  * division — mirror it verbatim). Tie on area keeps the EARLIEST
  * point (strict > replaces). Series with n ≤ k pass through
  * unchanged; a null array yields null.
  */
case class LttbSelect(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 3, "lttb target size k must be >= 3")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(s: StructType, _)
        if s.length == 3 && s.forall(_.dataType == LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName: argument must be array<struct<x: bigint, id: bigint, " +
            s"y: bigint>>, got ${other.catalogString}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "lttb_select"

  override def nullSafeEval(input: Any): Any =
    LttbSelect.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.LttbSelect.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LttbSelect {

  def apply(points: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      LttbSelect(GraftColumnBridge.toExpression(points), k))

  /** Exact sum of arr[lo, hi) as a correctly-rounded double. The fast
    * path is a plain Long accumulator; on overflow (epoch-µs sums
    * cross 2⁶³ at ~5,400 points per bucket) the bucket re-sums in
    * BigInteger, whose doubleValue is the same round-to-nearest an
    * engine summing in 128-bit applies — so the escape changes
    * nothing about cross-engine bit-equality. */
  private def sumToDouble(arr: Array[Long], lo: Int, hi: Int): Double = {
    var s = 0L
    var j = lo
    try {
      while (j < hi) { s = Math.addExact(s, arr(j)); j += 1 }
      s.toDouble
    } catch {
      case _: ArithmeticException =>
        var b = java.math.BigInteger.ZERO
        var m = lo
        while (m < hi) { b = b.add(java.math.BigInteger.valueOf(arr(m))); m += 1 }
        b.doubleValue
    }
  }

  def compute(points: ArrayData, k: Int): ArrayData = {
    val n = points.numElements()
    if (n <= k) return points.copy()
    val xs = new Array[Long](n)
    val ids = new Array[Long](n)
    val ys = new Array[Long](n)
    var i = 0
    while (i < n) {
      val row = points.getStruct(i, 3)
      xs(i) = row.getLong(0); ids(i) = row.getLong(1); ys(i) = row.getLong(2)
      i += 1
    }
    val kk = k - 2 // middle buckets
    val m = n - 2 // middle points
    val out = new Array[Any](k)
    out(0) = InternalRow(xs(0), ids(0), ys(0))
    var prevX = xs(0).toDouble
    var prevY = ys(0).toDouble
    var b = 0
    while (b < kk) {
      val lo = 1 + (b.toLong * m / kk).toInt
      val hi = 1 + ((b + 1).toLong * m / kk).toInt
      // average of the NEXT bucket (the last middle bucket averages
      // against the final point alone); Long sums are exact, ONE double
      // division each
      var ax = 0.0
      var ay = 0.0
      if (b < kk - 1) {
        val nlo = 1 + ((b + 1).toLong * m / kk).toInt
        val nhi = 1 + ((b + 2).toLong * m / kk).toInt
        val cnt = (nhi - nlo).toDouble
        ax = sumToDouble(xs, nlo, nhi) / cnt
        ay = sumToDouble(ys, nlo, nhi) / cnt
      } else {
        ax = xs(n - 1).toDouble
        ay = ys(n - 1).toDouble
      }
      var best = lo
      var bestArea = -1.0
      var j = lo
      while (j < hi) {
        val xj = xs(j).toDouble
        val yj = ys(j).toDouble
        val area = math.abs((prevX - ax) * (yj - prevY) - (prevX - xj) * (ay - prevY))
        if (area > bestArea) { bestArea = area; best = j }
        j += 1
      }
      out(b + 1) = InternalRow(xs(best), ids(best), ys(best))
      prevX = xs(best).toDouble
      prevY = ys(best).toDouble
      b += 1
    }
    out(k - 1) = InternalRow(xs(n - 1), ids(n - 1), ys(n - 1))
    new GenericArrayData(out)
  }
}
