package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, Expression, GreaterThan, If, IsNaN, IsNotNull, IsNull, Literal, Not, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** The latest-read argmax as a custom Catalyst `DeclarativeAggregate`:
  * value of the row with the largest (knowledge_time, change_time,
  * value) per group — the reference's `argMax(value, (kt, ct))`
  * (timedb/read.py:232-247) with the deterministic value tie-break.
  *
  * Why it exists: the built-in formulation `max(struct(kt, ct, value))`
  * carries a STRUCT aggregation buffer, which Spark's HashAggregate
  * cannot hold in its mutable row — the plan silently degrades to
  * partial+final SortAggregate (visible in PLANS.md), sorting every
  * partition by group key. This aggregate keeps a FLAT buffer
  * (two timestamps + double + seen-flag), which is hash-aggregable, so
  * the latest read becomes a pure HashAggregate — no per-partition
  * sort on unsorted inputs.
  *
  * Semantics match the struct-max exactly, including NaN ordering:
  * Spark's struct ordering treats NaN as greatest, while the IEEE `>`
  * used in expressions treats any NaN comparison as false — the value
  * tie-break therefore uses an explicit NaN-aware greater-than.
  */
case class ArgMaxLatest(kt: Expression, ct: Expression, value: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(kt, ct, value)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "argmax_latest"

  private lazy val mKt = AttributeReference("mKt", TimestampType)()
  private lazy val mCt = AttributeReference("mCt", TimestampType)()
  private lazy val mVal = AttributeReference("mVal", DoubleType)()
  private lazy val mSet = AttributeReference("mSet", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(mKt, mCt, mVal, mSet)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(null, TimestampType), Literal(null, TimestampType),
    Literal(null, DoubleType), Literal(false, BooleanType))

  /** `a > b` with nulls ordered LOWEST — matching struct ordering, where
    * a null field sorts below any value. A bare GreaterThan would return
    * null (→ false) whenever the buffer holds a null key, permanently
    * poisoning the buffer against all later rows. */
  private def tsGtNullsLow(a: Expression, b: Expression): Expression =
    Or(And(IsNull(b), IsNotNull(a)), GreaterThan(a, b))

  /** Same for doubles, with the NaN-greatest value ordering explicit. */
  private def valGtNullsLow(a: Expression, b: Expression): Expression =
    Or(And(IsNull(b), IsNotNull(a)),
      Or(And(IsNaN(a), Not(IsNaN(b))), GreaterThan(a, b)))

  /** (k, c, v) lexicographically greater than buffer (bKt, bCt, bVal),
    * shared verbatim by the update and merge paths so their semantics
    * cannot drift. */
  private def lexBeats(
      k: Expression, c: Expression, v: Expression,
      bKt: Expression, bCt: Expression, bVal: Expression, bSet: Expression): Expression =
    Or(Not(bSet),
      Or(tsGtNullsLow(k, bKt),
        And(EqualNullSafe(k, bKt),
          Or(tsGtNullsLow(c, bCt),
            And(EqualNullSafe(c, bCt), valGtNullsLow(v, bVal))))))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = lexBeats(kt, ct, value, mKt, mCt, mVal, mSet)
    Seq(
      If(better, kt, mKt),
      If(better, ct, mCt),
      If(better, value, mVal),
      Literal(true, BooleanType))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val rBeatsL = And(mSet.right,
      lexBeats(mKt.right, mCt.right, mVal.right, mKt.left, mCt.left, mVal.left, mSet.left))
    Seq(
      If(rBeatsL, mKt.right, mKt.left),
      If(rBeatsL, mCt.right, mCt.left),
      If(rBeatsL, mVal.right, mVal.left),
      Or(mSet.left, mSet.right))
  }

  override lazy val evaluateExpression: Expression = mVal

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(kt = newChildren(0), ct = newChildren(1), value = newChildren(2))
}

object ArgMaxLatest {
  /** `argmax_latest(kt, ct, value)` as a Column aggregate. */
  def apply(kt: Column, ct: Column, value: Column): Column =
    GraftColumnBridge.toColumn(
      ArgMaxLatest(GraftColumnBridge.toExpression(kt), GraftColumnBridge.toExpression(ct),
        GraftColumnBridge.toExpression(value)).toAggregateExpression())
}
