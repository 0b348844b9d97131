package graft.functions

import org.apache.spark.broadcast.Broadcast
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
  * prior/base constants), so each corpus row costs `tokens × classes`
  * lookups with NO |model|-way row expansion, NO join, NO aggregation
  * and NO window — the plan is scan → project. (The broadcast-join
  * formulation this replaces fanned the token frame out |classes|×
  * into a decimal aggregate and re-joined per doc; at sf0.1 that was
  * a 2.3 M-row exchange for a 620-entry model.)
  *
  * The model ships as a [[Broadcast]] handle, NOT inline in the
  * expression: the expression (and thus every task binary) carries
  * only the stub, and each executor fetches the vocab × classes
  * matrix once via the torrent broadcast instead of once per task —
  * the standard model-serving shape at cluster scale. The handle is
  * MEMOIZED by model content ([[NbScores.apply]]), so repeated
  * trainings of the same corpus — the bench's per-iteration query
  * rebuild — reuse one broadcast and their expressions compare equal
  * (subexpression elimination works); `invalidateModelMemo()`
  * destroys the handles when a data dir is rewritten.
  *
  * Arithmetic is replay-exact against the SQL oracle's decimal
  * formulation: per-present-pair terms accumulate as
  * `BigDecimal.valueOf(m · δ).setScale(10, HALF_UP)` (Spark's
  * `cast(double AS decimal(28,10))`), the class score adds the
  * decimal prior and `nd · base` the same way, rounds at scale 6
  * HALF_UP and only then narrows to double — so predictions AND
  * winning scores hash-match the join formulation bit for bit. Ties
  * break toward the lexicographically smallest class (classes arrive
  * sorted; strict improvement only). */
case class NbScores(child: Expression, model: Broadcast[NbScores.Model])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectArrayOf(prettyName, "token_counts", child,
      TokenHashCounts.schema.asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType)

  override def dataType: DataType = StructType(Seq(
    StructField("predicted", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  override def prettyName: String = "nb_scores"

  @transient private lazy val m = model.value

  override def nullSafeEval(v: Any): Any = {
    val tc = v.asInstanceOf[ArrayData]
    val n = tc.numElements()
    val nc = m.classes.length
    val sums = new Array[java.math.BigDecimal](nc)
    java.util.Arrays.fill(sums.asInstanceOf[Array[AnyRef]], java.math.BigDecimal.ZERO)
    var nd = 0L
    var i = 0
    while (i < n) {
      val row = tc.getStruct(i, 2)
      val w = row.getLong(0)
      val cnt = row.getLong(1)
      nd += cnt
      m.tokenIdx.get(w) match {
        case Some(r) =>
          val deltas = m.deltaMat(r)
          var c = 0
          while (c < nc) {
            val d = deltas(c)
            // m · δ promotes long × double exactly like the join
            // formulation's `col("__m") * col("__delta")`
            if (!d.isNaN)
              sums(c) = sums(c).add(java.math.BigDecimal
                .valueOf(cnt * d).setScale(10, java.math.RoundingMode.HALF_UP))
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
      val score = sums(c).add(m.priors(c))
        .add(java.math.BigDecimal.valueOf(nd.toDouble * m.bases(c))
          .setScale(10, java.math.RoundingMode.HALF_UP))
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      if (best < 0 || score > bestScore) { best = c; bestScore = score }
      c += 1
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    out.update(0, UTF8String.fromString(m.classes(best)))
    out.update(1, bestScore)
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NbScores {

  /** The executor-resident model: sorted class names, their log-priors
    * (10-scale decimals) and 8dp base terms, the token-hash → row
    * index, and the dense (token × class) delta matrix with NaN
    * marking pairs absent from the training mass. */
  final case class Model(classes: Array[String],
      priors: Array[java.math.BigDecimal], bases: Array[Double],
      tokenIdx: Map[Long, Int], deltaMat: Array[Array[Double]])
      extends Serializable

  // Broadcast memo keyed by the model's CONTENT (fully structural —
  // immutable lists, not arrays, so equals/hashCode are value-based):
  // the bench rebuilds the query per timing iteration, and a fresh
  // torrent broadcast per apply call both accumulated never-destroyed
  // blocks on driver and executors AND made two expressions from
  // separate apply calls compare unequal (same handle ⇒ case-class
  // equality ⇒ subexpression elimination works again). Vocab × classes
  // is catalog-sized, so the structural key costs microseconds.
  //
  // Doubles enter the key as their raw BIT PATTERNS (doubleToLongBits):
  // deltaMat marks absent (token, class) pairs with NaN, and boxed
  // NaN == NaN is false, so a List[Double] key would NEVER hit for a
  // real trained model — every apply would mint (and strongly pin) a
  // fresh broadcast, the exact leak the memo exists to close. Bit
  // patterns compare NaN-stably (one canonical NaN from
  // doubleToLongBits) and cost the same to build.
  //
  // The key also carries the owning SparkContext's applicationId: a
  // handle minted under a stopped-and-recreated context must not be
  // served to the new one (it would fail at execution), and two
  // sessions in one JVM must not share handles.
  //
  // Cleared (with destroy) alongside SparkEntry.invalidateBuildMemos —
  // a rewritten data dir retrains the model, and the stale broadcast
  // must not pin executor memory for the rest of the session.
  private type ModelKey = (String, List[String], List[java.math.BigDecimal], List[Long],
    Map[Long, Int], List[List[Long]])
  private val modelMemo =
    scala.collection.concurrent.TrieMap.empty[ModelKey, Broadcast[Model]]

  /** Destroy and forget every memoized model broadcast. */
  def invalidateModelMemo(): Unit = {
    modelMemo.values.foreach(b => try b.destroy() catch { case _: Throwable => () })
    modelMemo.clear()
  }

  /** Memoized broadcast handle for a model, exposed for the memo-hit
    * spec; production callers go through [[apply]]. */
  private[graft] def broadcastFor(classes: Array[String],
      priors: Array[java.math.BigDecimal], bases: Array[Double],
      tokenIdx: Map[Long, Int], deltaMat: Array[Array[Double]]): Broadcast[Model] = {
    val spark = org.apache.spark.sql.SparkSession.active
    val bits = (a: Array[Double]) =>
      a.iterator.map(java.lang.Double.doubleToLongBits).toList
    val key: ModelKey = (spark.sparkContext.applicationId, classes.toList,
      priors.toList, bits(bases), tokenIdx, deltaMat.iterator.map(bits).toList)
    modelMemo.get(key) match {
      case Some(b) => b
      case None =>
        // A miss is the cheap moment to evict entries minted under
        // OTHER applications: their contexts are gone (or foreign), the
        // appId key already prevents serving them, and leaving them in
        // the map would pin dead Broadcast handles for the JVM's life —
        // a small permanent leak inside the memo that exists to close
        // one. destroy() on a dead context throws; dropping the entry
        // is the real reclamation (the GC can then collect the handle).
        modelMemo.keys.filter(_._1 != key._1).foreach { k =>
          modelMemo.remove(k).foreach(b =>
            try b.destroy() catch { case _: Throwable => () })
        }
        // putIfAbsent, not getOrElseUpdate: under a race the latter can
        // run the broadcast op twice and DROP one handle unmemoized —
        // the loser must be destroyed, not leaked.
        val fresh = spark.sparkContext.broadcast(
          Model(classes, priors, bases, tokenIdx, deltaMat))
        modelMemo.putIfAbsent(key, fresh) match {
          case None => fresh
          case Some(winner) =>
            try fresh.destroy() catch { case _: Throwable => () }
            winner
        }
    }
  }

  def apply(tokenCounts: Column, classes: Array[String],
      priors: Array[java.math.BigDecimal], bases: Array[Double],
      tokenIdx: Map[Long, Int], deltaMat: Array[Array[Double]]): Column = {
    require(classes.nonEmpty, "NB model must have at least one class")
    val bc = broadcastFor(classes, priors, bases, tokenIdx, deltaMat)
    GraftColumnBridge.toColumn(NbScores(
      GraftColumnBridge.toExpression(tokenCounts), bc))
  }
}
