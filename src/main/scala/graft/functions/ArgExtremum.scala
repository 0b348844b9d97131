package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, If, IsNotNull, LessThan, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, FloatType}

/** Generic flat-buffer argmin/argmax: the value of the row with the
  * extreme (ord1, ord2) key per group — `min_by`/`max_by` over a
  * two-part ordering key, without the struct ordering buffer.
  *
  * Why it exists: `min_by(value, struct(ord1, ord2))` carries a
  * STRUCT buffer, which Spark's HashAggregate cannot hold in its
  * mutable row — the plan silently degrades to partial+final
  * SortAggregate (the [[ArgMaxLatest]] rationale, generalized beyond
  * the latest read's fixed (timestamp, timestamp, double) shape).
  * This aggregate's buffer is the three child slots + a seen-flag —
  * all flat — so it hash-aggregates, and under Structured Streaming's
  * incremental aggregation the state per open group is those same
  * four slots.
  *
  * Ordering contract: `ord1`/`ord2` must be orderable non-floating
  * atomic types (timestamps, integral, strings — the OHLC (ts, id)
  * key). Rows whose ord1 is null are skipped, matching
  * `min_by`/`max_by`; ord2 null sorts below any value (only reachable
  * when ord1 ties on a skipped-null row, i.e. never for total keys).
  * Floating-point ord columns would need the struct-ordering NaN
  * convention — use [[ArgMaxLatest]] for the (kt, ct, NaN-aware
  * value) latest-read shape.
  */
case class ArgExtremum(ord1: Expression, ord2: Expression, value: Expression,
    max: Boolean) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(ord1, ord2, value)

  /** The ordering contract above, ENFORCED at analysis: a double ord
    * column was previously accepted silently and compared with the
    * non-NaN-aware GreaterThan/LessThan, diverging from min_by/max_by's
    * struct ordering on NaN keys. */
  override def checkInputDataTypes(): TypeCheckResult = {
    val floating = Seq("ord1" -> ord1, "ord2" -> ord2).collectFirst {
      case (n, e) if e.dataType == FloatType || e.dataType == DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: '$n' must not be floating-point (NaN ordering would " +
            s"diverge from min_by/max_by struct ordering), got ${e.dataType.simpleString}")
    }
    floating.getOrElse(KernelTypeChecks.firstFailure(
      TypeUtils.checkForOrderingExpr(ord1.dataType, s"$prettyName ord1"),
      TypeUtils.checkForOrderingExpr(ord2.dataType, s"$prettyName ord2")))
  }

  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType
  override def prettyName: String = if (max) "arg_max_by2" else "arg_min_by2"

  private lazy val bOrd1 = AttributeReference("bOrd1", ord1.dataType)()
  private lazy val bOrd2 = AttributeReference("bOrd2", ord2.dataType)()
  private lazy val bVal = AttributeReference("bVal", value.dataType)()
  private lazy val bSet = AttributeReference("bSet", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bOrd1, bOrd2, bVal, bSet)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, ord1.dataType), Literal.create(null, ord2.dataType),
    Literal.create(null, value.dataType), Literal(false, BooleanType))

  /** Strict direction compare with nulls LOWEST (for max) / HIGHEST
    * skipped (for min the null-low convention still means a null never
    * beats a value and any value beats null). */
  private def beats(a: Expression, b: Expression): Expression = {
    val strict = if (max) GreaterThan(a, b) else LessThan(a, b)
    // null semantics: a null `a` never wins; a non-null `a` beats a
    // null `b` — the buffer only holds null ords before first update
    Or(And(IsNotNull(a), Not(IsNotNull(b))), strict)
  }

  private def keyBeats(k1: Expression, k2: Expression,
      o1: Expression, o2: Expression, set: Expression): Expression =
    And(IsNotNull(k1), // null ord1 rows are skipped, as min_by/max_by
      Or(Not(set),
        Or(beats(k1, o1), And(EqualTo(k1, o1), beats(k2, o2)))))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = keyBeats(ord1, ord2, bOrd1, bOrd2, bSet)
    Seq(
      If(better, ord1, bOrd1),
      If(better, ord2, bOrd2),
      If(better, value, bVal),
      Or(bSet, IsNotNull(ord1)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val rBeatsL = And(bSet.right,
      keyBeats(bOrd1.right, bOrd2.right, bOrd1.left, bOrd2.left, bSet.left))
    Seq(
      If(rBeatsL, bOrd1.right, bOrd1.left),
      If(rBeatsL, bOrd2.right, bOrd2.left),
      If(rBeatsL, bVal.right, bVal.left),
      Or(bSet.left, bSet.right))
  }

  override lazy val evaluateExpression: Expression = bVal

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord1 = newChildren(0), ord2 = newChildren(1), value = newChildren(2))
}

object ArgExtremum {
  /** `value` of the row with the LARGEST (ord1, ord2) per group. */
  def maxBy(value: Column, ord1: Column, ord2: Column): Column =
    GraftColumnBridge.toColumn(ArgExtremum(
      GraftColumnBridge.toExpression(ord1), GraftColumnBridge.toExpression(ord2),
      GraftColumnBridge.toExpression(value), max = true).toAggregateExpression())

  /** `value` of the row with the SMALLEST (ord1, ord2) per group. */
  def minBy(value: Column, ord1: Column, ord2: Column): Column =
    GraftColumnBridge.toColumn(ArgExtremum(
      GraftColumnBridge.toExpression(ord1), GraftColumnBridge.toExpression(ord2),
      GraftColumnBridge.toExpression(value), max = false).toAggregateExpression())
}
