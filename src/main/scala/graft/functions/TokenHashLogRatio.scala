package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StructField, StructType}

/** Per-document mean log-likelihood-ratio scoring as a SINGLE
  * PROJECTION over a [[TokenHashCounts]] column: returns
  * `struct(n_tokens, log_ratio)` for a broadcast token → per-token
  * log-ratio term map — the serving half of DSIR importance weighting
  * ([[graft.operators.TextAnalysis.importanceWeights]]).
  *
  * The [[NbScores]] model-serving shape: the term map is VOCAB-bounded
  * and ships once per executor via the broadcast handle, so scoring is
  * scan → project with NO (doc, token) join and NO per-doc aggregation
  * — the join formulation this replaces shuffled the full token-pair
  * frame twice (once into the term join, once back into the per-doc
  * sum), the two widest exchanges in the query.
  *
  * Arithmetic replays the relational formulation bit for bit: each
  * present pair accumulates `BigDecimal.valueOf(m · term).setScale(10,
  * HALF_UP)` (Spark's `cast(double AS decimal(28,10))`), the decimal
  * sum narrows to double, divides by the doc's token mass and rounds
  * at 6dp HALF_UP (Spark's `round(x, 6)`). Tokens absent from the map
  * are skipped ENTIRELY — same as the inner term join, where an
  * unseen token matched no term row and contributed to neither the
  * sum nor the joined token mass. Zero scorable tokens → (0, null),
  * the lmScores convention. */
case class TokenHashLogRatio(child: Expression,
    terms: Broadcast[Map[Long, Double]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectArrayOf(prettyName, "token_counts", child,
      TokenHashCounts.schema.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("log_ratio", DoubleType, nullable = true)))

  override def prettyName: String = "token_hash_log_ratio"

  @transient private lazy val t = terms.value

  override def nullSafeEval(v: Any): Any = {
    val tc = v.asInstanceOf[ArrayData]
    val n = tc.numElements()
    var sum = java.math.BigDecimal.ZERO
    var nd = 0L
    var i = 0
    while (i < n) {
      val row = tc.getStruct(i, 2)
      val w = row.getLong(0)
      val m = row.getLong(1)
      t.get(w) match {
        case Some(term) =>
          nd += m
          sum = sum.add(java.math.BigDecimal.valueOf(m * term)
            .setScale(10, java.math.RoundingMode.HALF_UP))
        case None => // unseen token: outside the model, outside the mean
      }
      i += 1
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    out.update(0, nd)
    if (nd == 0L) out.update(1, null)
    else out.update(1, java.math.BigDecimal
      .valueOf(sum.doubleValue() / nd)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashLogRatio {
  def apply(tokenCounts: Column, terms: Broadcast[Map[Long, Double]]): Column =
    GraftColumnBridge.toColumn(TokenHashLogRatio(
      GraftColumnBridge.toExpression(tokenCounts), terms))
}
