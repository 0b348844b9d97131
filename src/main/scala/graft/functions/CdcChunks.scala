package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd content-defined chunking (the rolling-hash primitive
  * behind FastCDC-style blob/document dedup): one pass over the row's
  * code points emits `struct(start, len, digest)` per chunk, where
  * chunk boundaries fall at positions whose rolling hash of the last
  * `window` code points is 0 mod `avgSize` — so boundaries are a pure
  * function of LOCAL content. An insertion or deletion re-chunks only
  * its neighborhood; every chunk after the edit keeps its digest,
  * which is exactly why CDC beats fixed-size spans for dedup of
  * near-identical blobs (fixed grids shift globally on a 1-char edit).
  *
  * Engine-portable by construction, so a SQL oracle can replay it:
  * positions and substrings are CODE-POINT based (DuckDB `substr`/
  * `len`/`unicode` semantics; supplementary planes handled), the roll
  * is `Σ c_{i−j}·B^j mod P` with B=257, P=1000003 (coefficient
  * literals both sides), and the chunk digest is the repo's portable
  * 60-bit md5 prefix ([[Portable.hash60]]) of the chunk substring.
  *
  * ==Bounds (the production variant)==
  * `minSize`/`maxSize` add FastCDC-style chunk bounds: hash boundaries
  * are suppressed while the open chunk is shorter than `minSize`, and
  * a boundary is FORCED when it reaches `maxSize` — the caps that tame
  * the unbounded form's degenerate inputs (a constant run otherwise
  * yields window-sized slivers or one whole-text chunk). Bounds make
  * the boundary set SEQUENTIAL (each boundary depends on the previous
  * one), which only a recursive oracle could replay — so the bounded
  * form is the production face (spec-pinned), while `minSize = maxSize
  * = 0` is the classic unbounded form the SQL oracle replays. An edit
  * still re-chunks only its neighborhood: resynchronization happens at
  * the first unsuppressed hash boundary after the edit.
  *
  * Empty text yields an empty array; null text yields null.
  */
case class CdcChunks(child: Expression, window: Int, avgSize: Int,
    minSize: Int = 0, maxSize: Int = 0)
    extends UnaryExpression {

  require(window >= 1 && window <= 64, "window must be in [1, 64]")
  require(avgSize >= 2, "avgSize must be >= 2")
  require(minSize >= 0, "minSize must be >= 0 (0 = unbounded)")
  require(maxSize >= 0, "maxSize must be >= 0 (0 = unbounded)")
  require(maxSize == 0 || maxSize >= math.max(minSize, 1),
    "maxSize must be >= minSize when bounded")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = CdcChunks.schema

  override def prettyName: String = "cdc_chunks"

  override def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], window, avgSize,
      minSize, maxSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c, $window, $avgSize, $minSize, $maxSize);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunks {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("digest", LongType, nullable = false))), containsNull = false)

  def apply(text: Column, window: Int, avgSize: Int): Column =
    GraftColumnBridge.toColumn(
      CdcChunks(GraftColumnBridge.toExpression(text), window, avgSize))

  /** Bounded (production) variant — see the class doc's Bounds section. */
  def apply(text: Column, window: Int, avgSize: Int,
      minSize: Int, maxSize: Int): Column =
    GraftColumnBridge.toColumn(
      CdcChunks(GraftColumnBridge.toExpression(text), window, avgSize,
        minSize, maxSize))

  val B: Long = 257L
  val P: Long = 1000003L

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(utf8 bytes) as a non-negative long —
    * the JVM twin of [[Portable.hash60]] / the oracle's
    * `CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`. */
  private def digest60(s: String): Long = {
    val md = md5.get()
    md.reset()
    val dig = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // 15 hex digits = first 7 bytes + the high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xFFL); i += 1 }
    (v << 4) | ((dig(7) >> 4) & 0xFL)
  }

  def compute(text: UTF8String, window: Int, avgSize: Int): ArrayData =
    compute(text, window, avgSize, 0, 0)

  def compute(text: UTF8String, window: Int, avgSize: Int,
      minSize: Int, maxSize: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // Fixed-grid fast path (r19): minSize == maxSize forces a boundary
    // at exactly maxSize code points before the hash test can ever
    // fire (the force is checked first, and the hash is suppressed
    // below minSize), so boundaries are a fixed grid and the rolling
    // hash — the per-code-point multiply chain and both scratch
    // arrays — is provably dead work. One pass: walk chars, cut every
    // maxSize code points. Same output as the general path by the
    // suppression argument (spec-pinned in FunctionsKernelSpec).
    if (minSize == maxSize && maxSize > 0) {
      val chunks = new scala.collection.mutable.ArrayBuffer[Any]()
      var chunkStartChar = 0
      var chunkStartCp = 0
      var cpInChunk = 0
      var cpTotal = 0
      var ci = 0
      while (ci < n) {
        ci += Character.charCount(s.codePointAt(ci))
        cpInChunk += 1
        cpTotal += 1
        if (cpInChunk == maxSize || ci >= n) {
          chunks += InternalRow(chunkStartCp + 1, cpInChunk,
            digest60(s.substring(chunkStartChar, ci)))
          chunkStartChar = ci
          chunkStartCp = cpTotal
          cpInChunk = 0
        }
      }
      return new GenericArrayData(chunks.toArray)
    }
    // code points + the char offset where each begins (so chunk
    // substrings slice by code-point position, the oracle's substr)
    var cpCount = 0
    val cps = new Array[Int](n)
    val charOff = new Array[Int](n + 1)
    var ci = 0
    while (ci < n) {
      val cp = s.codePointAt(ci)
      cps(cpCount) = cp
      charOff(cpCount) = ci
      cpCount += 1
      ci += Character.charCount(cp)
    }
    charOff(cpCount) = n
    val coeff = new Array[Long](window) // B^j mod P
    var j = 0
    var acc = 1L
    while (j < window) { coeff(j) = acc; acc = acc * B % P; j += 1 }
    val chunks = new scala.collection.mutable.ArrayBuffer[Any]()
    var prevBoundary = 0 // code-point index of the last boundary (exclusive start)
    var i = 0
    while (i < cpCount) {
      val isLast = i == cpCount - 1
      val openLen = i + 1 - prevBoundary
      var boundary = isLast || (maxSize > 0 && openLen >= maxSize)
      if (!boundary && openLen >= minSize && i + 1 >= window) {
        var roll = 0L
        var k = 0
        while (k < window) { roll += cps(i - k) % P * coeff(k) % P; k += 1 }
        boundary = roll % P % avgSize == 0
      }
      if (boundary) {
        val startCp = prevBoundary // 0-based; emitted 1-based
        val lenCp = i + 1 - prevBoundary
        val sub = s.substring(charOff(startCp), charOff(i + 1))
        chunks += InternalRow(startCp + 1, lenCp, digest60(sub))
        prevBoundary = i + 1
      }
      i += 1
    }
    new GenericArrayData(chunks.toArray)
  }
}
