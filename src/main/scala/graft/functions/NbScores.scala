package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Multinomial Naive Bayes scoring as a SINGLE PROJECTION: for a
  * [[TokenHashCounts]] term-frequency column, returns
  * `struct(predicted, score)` — the argmax class over a
  * driver-collected sparse log-probability model.
  *
  * The [[NearestCentroid]] pattern applied to text classification: the
  * model is VOCAB-bounded (distinct-token × class deltas + per-class
  * prior/base constants), so it ships inside the expression and each
  * corpus row costs `tokens × classes` lookups with NO |model|-way row
  * expansion, NO join, NO aggregation and NO window — the plan is
  * scan → project. (The broadcast-join formulation this replaces
  * fanned the token frame out |classes|× into a decimal aggregate and
  * re-joined per doc; at sf0.1 that was a 2.3 M-row exchange for a
  * 620-entry model.)
  *
  * Arithmetic is replay-exact against the SQL oracle's decimal
  * formulation: per-present-pair terms accumulate as
  * `BigDecimal.valueOf(m · δ).setScale(10, HALF_UP)` (Spark's
  * `cast(double AS decimal(28,10))`), the class score adds the
  * decimal prior and `nd · base` the same way, rounds at scale 6
  * HALF_UP and only then narrows to double — so predictions AND
  * winning scores hash-match the join formulation bit for bit. Ties
  * break toward the lexicographically smallest class (classes arrive
  * sorted; strict improvement only).
  *
  * `classes` are the sorted class names; `priors(i)`/`bases(i)` their
  * log-prior (as the 10-scale decimal the engine's cast produces) and
  * 8dp-rounded base term; `tokenIdx` maps a token hash to its row in
  * `deltaMat`, whose `Double.NaN` entries mark (token, class) pairs
  * absent from the training mass. */
case class NbScores(child: Expression, classes: Array[String],
    priors: Array[java.math.BigDecimal], bases: Array[Double],
    tokenIdx: Map[Long, Int], deltaMat: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectArrayOf(prettyName, "token_counts", child,
      TokenHashCounts.schema.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)

  override def dataType: DataType = StructType(Seq(
    StructField("predicted", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def prettyName: String = "nb_scores"

  override def nullSafeEval(v: Any): Any = {
    val tc = v.asInstanceOf[ArrayData]
    val n = tc.numElements()
    val nc = classes.length
    val sums = new Array[java.math.BigDecimal](nc)
    java.util.Arrays.fill(sums.asInstanceOf[Array[AnyRef]], java.math.BigDecimal.ZERO)
    var nd = 0L
    var i = 0
    while (i < n) {
      val row = tc.getStruct(i, 2)
      val w = row.getLong(0)
      val m = row.getLong(1)
      nd += m
      tokenIdx.get(w) match {
        case Some(r) =>
          val deltas = deltaMat(r)
          var c = 0
          while (c < nc) {
            val d = deltas(c)
            // m · δ promotes long × double exactly like the join
            // formulation's `col("__m") * col("__delta")`
            if (!d.isNaN)
              sums(c) = sums(c).add(java.math.BigDecimal
                .valueOf(m * d).setScale(10, java.math.RoundingMode.HALF_UP))
            c += 1
          }
        case None => // token absent from the model: contributes nd only
      }
      i += 1
    }
    var best = -1
    var bestScore = 0.0
    var c = 0
    while (c < nc) {
      val score = sums(c).add(priors(c))
        .add(java.math.BigDecimal.valueOf(nd.toDouble * bases(c))
          .setScale(10, java.math.RoundingMode.HALF_UP))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (best < 0 || score > bestScore) { best = c; bestScore = score }
      c += 1
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    out.update(0, UTF8String.fromString(classes(best)))
    out.update(1, bestScore)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbScores {
  def apply(tokenCounts: Column, classes: Array[String],
      priors: Array[java.math.BigDecimal], bases: Array[Double],
      tokenIdx: Map[Long, Int], deltaMat: Array[Array[Double]]): Column = {
    require(classes.nonEmpty, "NB model must have at least one class")
    GraftColumnBridge.toColumn(NbScores(
      GraftColumnBridge.toExpression(tokenCounts),
      classes, priors, bases, tokenIdx, deltaMat))
  }
}
