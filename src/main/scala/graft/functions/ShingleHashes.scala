package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word-n-gram shingle hashes of a text column: the complete
  * `array<long>` of gram hashes per row, computed in one compiled loop.
  *
  * Semantics are EXACTLY the portable formulation the DuckDB oracle
  * replicates (and that [[graft.operators.Dedup.shingleStream]] used to
  * assemble from SQL primitives):
  *
  *  - tokens = split on single space, empty tokens dropped
  *    (byte-level split is safe: 0x20 never occurs inside a multi-byte
  *    UTF-8 sequence)
  *  - per-token hash = first 8 hex digits of md5(token) as a BIGINT
  *    ([[Portable.hash32]] = the digest's first 4 bytes, big-endian,
  *    unsigned)
  *  - gram hash = left fold `acc ← (acc·1000003 + h_k) mod p` over the
  *    gram's tokens, p = 2^31−1 ([[Portable.MinHashPrime]]); n = 1
  *    yields the token hashes themselves
  *  - fewer than n tokens → empty array; null text → null
  *
  * The SQL assembly of the same values — `transform` lambdas calling
  * md5/conv per token — evaluates interpreted per element and measured
  * ~10× slower; this expression is one virtual call per ROW from
  * whole-stage codegen into a tight primitive loop (one md5 per token,
  * zero per-element plumbing). Every shingle consumer (Jaccard, MinHash,
  * LSH, SimHash, contamination, repetition) sits downstream of this
  * expression, so it is the single hottest scalar kernel in the dedup
  * family.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  // SQL-reachable via GraftExtensions, so wrong-typed input must fail
  // ANALYSIS, not crash mid-job.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  def apply(text: Column, n: Int): Column = apply(text, n, distinct = false)

  /** `distinct = true` dedups the gram multiset IN the kernel and
    * returns it SORTED ascending — set-semantics consumers get the
    * row-level equivalent of `distinct()` (and `sort_array`) without
    * any exchange. */
  def apply(text: Column, n: Int, distinct: Boolean): Column =
    GraftColumnBridge.toColumn(
      ShingleHashes(GraftColumnBridge.toExpression(text), n, distinct))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(text: UTF8String, n: Int): ArrayData = compute(text, n, distinct = false)

  /** Per-token [[Portable.hash32]] values of a row's text — tokens are
    * the non-empty runs between 0x20 bytes (byte-split is UTF-8-safe),
    * hash = the md5 digest's first 4 bytes, big-endian, unsigned. THE
    * single copy of the load-bearing tokenize+hash loop: every kernel
    * that tokenizes ([[ShingleHashes]], [[TextFingerprint]]) goes
    * through here, so the oracle-pinned token semantics cannot drift
    * between them. Returns the hash array and the token count (the
    * array may be longer). */
  private[functions] def tokenHashes(bytes: Array[Byte]): (Array[Long], Int) = {
    val digest = md5.get()
    var hashes = new Array[Long](math.max(8, bytes.length / 4))
    var m = 0
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          digest.reset()
          digest.update(bytes, start, i - start)
          val d = digest.digest()
          if (m == hashes.length) hashes = java.util.Arrays.copyOf(hashes, m * 2)
          hashes(m) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          m += 1
        }
        start = i + 1
      }
      i += 1
    }
    (hashes, m)
  }

  /** Gram-hash array for one row; entry point for both interpreted eval
    * and the generated code. `distinct` dedups AND sorts ascending. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val (hashes, m) = tokenHashes(text.getBytes)
    val grams =
      if (n == 1) java.util.Arrays.copyOf(hashes, m)
      else if (m < n) Array.emptyLongArray
      else {
        val out = new Array[Long](m - n + 1)
        var g = 0
        while (g <= m - n) {
          var acc = hashes(g)
          var k = 1
          while (k < n) {
            acc = java.lang.Math.floorMod(acc * 1000003L + hashes(g + k), Portable.MinHashPrime)
            k += 1
          }
          out(g) = acc
          g += 1
        }
        out
      }
    new GenericArrayData(if (distinct) sortedDistinct(grams) else grams)
  }

  private def sortedDistinct(a: Array[Long]): Array[Long] = {
    if (a.length <= 1) return a
    java.util.Arrays.sort(a)
    var w = 1
    var r = 1
    while (r < a.length) {
      if (a(r) != a(w - 1)) { a(w) = a(r); w += 1 }
      r += 1
    }
    if (w == a.length) a else java.util.Arrays.copyOf(a, w)
  }
}
