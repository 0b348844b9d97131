package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd MinHash signature of a gram-hash array: for each of
  * `numHashes` fixed universal-hash permutations ([[Portable
  * .minHashPerm]]: `(a_i·h + b_i) mod p`, identical coefficients), the
  * minimum over the row's grams — the full `array<long>` signature in
  * one compiled loop per row.
  *
  * A MinHash signature is a pure function of ONE document's shingles,
  * so computing it per row removes the aggregate formulation's shuffle
  * of the entire shingle stream keyed by doc id — at 100 TB that
  * exchange moved every token-derived row just to fold per-doc minima
  * that never needed to leave the row. With this expression the whole
  * signature layer (MinHash, and [[SimHashFromGrams]] likewise) is
  * embarrassingly parallel; the only exchanges left in the dedup
  * family are the content-keyed bucket/posting aggregations.
  *
  * Min is duplicate-insensitive, so distinct and multiset gram inputs
  * yield identical signatures. An EMPTY gram array yields NULL (the
  * aggregate formulation emitted no row for such docs; callers filter).
  */
case class MinHashFromGrams(child: Expression, numHashes: Int) extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  // SQL-reachable via GraftExtensions: a non-long array would read
  // misaligned bytes via getLong, and a null element would read as a
  // 0 gram silently — reject both at analysis.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectNonNullArrayOf(prettyName, "grams", child, LongType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "minhash_from_grams"

  override def nullSafeEval(input: Any): Any =
    MinHashFromGrams.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val out = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.MinHashFromGrams.compute($c, $numHashes);
         |if ($out == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $out; }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFromGrams {

  def apply(grams: Column, numHashes: Int): Column =
    GraftColumnBridge.toColumn(
      MinHashFromGrams(GraftColumnBridge.toExpression(grams), numHashes))

  // Permutation coefficients depend only on numHashes — memoized so the
  // per-row path never reallocates/reboxes them (short documents are the
  // common case; a per-row rebuild was a measurable fixed overhead).
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  private def coeffs(numHashes: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numHashes, k => {
      val as = new Array[Long](k)
      val bs = new Array[Long](k)
      var i = 0
      while (i < k) {
        val (a, b) = Portable.minHashCoeffs(i)
        as(i) = a; bs(i) = b
        i += 1
      }
      (as, bs)
    })

  /** Signature array for one row's grams; null when the row has no
    * grams. Entry point for interpreted eval and generated code. */
  def compute(grams: ArrayData, numHashes: Int): ArrayData = {
    val m = grams.numElements()
    if (m == 0) return null
    val p = Portable.MinHashPrime
    val (as, bs) = coeffs(numHashes)
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var g = 0
    while (g < m) {
      val h = grams.getLong(g)
      var k = 0
      while (k < numHashes) {
        val v = java.lang.Math.floorMod(h * as(k) + bs(k), p)
        if (v < sig(k)) sig(k) = v
        k += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }
}
