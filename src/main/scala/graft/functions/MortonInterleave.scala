package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd Morton (z-order) bit interleave of two bucket ids: bit i
  * of `left` lands at position 2i, bit i of `right` at 2i+1 — the
  * address computation behind [[graft.operators.Layout]]'s
  * multi-dimensional clustering.
  *
  * The Column-fold formulation ([[graft.operators.Layout.interleave]]
  * used it originally) builds a 2·bits-term shift/mask expression tree;
  * correct, but each term re-reads both inputs and the tree defeats
  * common-subexpression reuse. This kernel is one virtual call from
  * whole-stage codegen into a magic-number bit spread — O(log bits)
  * shifts per row regardless of `bits` — and gives `spark.sql` users
  * the same address (`morton_interleave(bx, by, bits)`), so a layout
  * job can be written entirely in SQL.
  *
  * Inputs must already be bucket ids in [0, 2^bits); higher bits are
  * masked off (the bucketing upstream owns the range invariant).
  */
case class MortonInterleave(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: bx must be BIGINT, got ${left.dataType.simpleString}")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: by must be BIGINT, got ${right.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType

  override def prettyName: String = "morton_interleave"

  override def nullSafeEval(a: Any, b: Any): Any =
    MortonInterleave.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.MortonInterleave.compute($a, $b, $bits);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MortonInterleave {

  def apply(a: Column, b: Column, bits: Int): Column =
    GraftColumnBridge.toColumn(MortonInterleave(
      GraftColumnBridge.toExpression(a), GraftColumnBridge.toExpression(b), bits))

  /** Spread the low 31 bits of `v` into the even positions of a long
    * (classic magic-number dilation, 5 shift/mask rounds). */
  private def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Entry point for both interpreted eval and generated code. */
  def compute(a: Long, b: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    spread(a & mask) | (spread(b & mask) << 1)
  }
}
