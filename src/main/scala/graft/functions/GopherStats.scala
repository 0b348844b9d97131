package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-call Gopher-rule statistics: every count the
  * published rule gate (Rae et al. 2021 Table A1 — see
  * [[graft.operators.TextAnalysis.gopherRules]]) needs, from compiled
  * loops over the row's UTF-8 bytes. Replaces a ~10-pass higher-order-
  * function formulation (interpreted per element — measured 42 µs/doc,
  * 150× the [[TextStats]] kernel) with tight byte scans; the only
  * allocations are one String per LINE for the duplicate-line census.
  *
  * Semantics are IDENTICAL to the SQL primitives the oracle runs, so
  * the `x_quality_gopher` hash-match is unchanged:
  *
  *  - words        = maximal runs delimited by ASCII whitespace
  *    (0x20, 0x09, 0x0A, 0x0D — so newlines and tabs BREAK words,
  *    matching `regexp_split_to_array(text, '[ \t\n\r]')` with empties
  *    dropped; the pre-r13 kernel split on 0x20 only, undercounting
  *    `n_words` on multi-line text)
  *  - word_len_sum = Σ `length(word)` in codepoints (UTF-8 lead bytes)
  *  - alpha_words  = words containing an ASCII letter (`[A-Za-z]`)
  *  - stops_present= DISTINCT constructor stopwords present as
  *    ASCII-case-insensitive whole words (a bitmask popcount)
  *  - n_hashes     = `#` bytes in the whole text
  *  - n_ellipses   = non-overlapping leftmost `...` occurrences PLUS
  *    `…` (U+2026) occurrences — the published Gopher symbol counts
  *    threshold hash and ellipsis ratios SEPARATELY (Rae et al. 2021
  *    Table A1), so the kernel reports them separately; the SQL
  *    equivalent is `(length(t) − length(replace(t,'...','')))/3 +
  *    (length(t) − length(replace(t,'…','')))`
  *  - lines        = `split(text, "\n")` INCLUDING empty strings
  *  - bullet_lines = lines whose space-left-trimmed form starts with
  *    `-`, `*` or `•`
  *  - ellipsis_lines = lines whose space-right-trimmed form ends with
  *    `...` or `…`
  *  - line_char_sum / distinct_lines / dup_line_char_sum — the
  *    duplicate-line census: byte-exact line values, chars counted in
  *    codepoints; `dup_line_char_sum` sums chars over ALL instances of
  *    values occurring more than once.
  *
  * Null text yields a null struct; empty text yields one empty line
  * (the `split` contract) and zero words.
  */
case class GopherStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = GopherStats.schema

  override def prettyName: String = "gopher_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    TextStats.toStopBytes(stopwords.map(_.toLowerCase(java.util.Locale.ROOT)))

  override def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.GopherStats.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GopherStats {

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("word_len_sum", LongType, nullable = false),
    StructField("alpha_words", LongType, nullable = false),
    StructField("stops_present", LongType, nullable = false),
    StructField("n_hashes", LongType, nullable = false),
    StructField("n_ellipses", LongType, nullable = false),
    StructField("n_lines", LongType, nullable = false),
    StructField("bullet_lines", LongType, nullable = false),
    StructField("ellipsis_lines", LongType, nullable = false),
    StructField("line_char_sum", LongType, nullable = false),
    StructField("distinct_lines", LongType, nullable = false),
    StructField("dup_line_char_sum", LongType, nullable = false)))

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftColumnBridge.toColumn(
      GopherStats(GraftColumnBridge.toExpression(text), stopwords))

  private def numChars(bytes: Array[Byte], off: Int, len: Int): Int = {
    var c = 0
    var i = off
    while (i < off + len) { if ((bytes(i) & 0xc0) != 0x80) c += 1; i += 1 }
    c
  }

  /** ASCII-case-insensitive whole-word match against a lowercased
    * stopword; non-ASCII bytes compare exact (they can never equal an
    * ASCII stopword byte anyway). */
  private def stopIndex(bytes: Array[Byte], off: Int, len: Int,
      stops: Array[Array[Byte]]): Int = {
    var s = 0
    while (s < stops.length) {
      val sw = stops(s)
      if (sw.length == len) {
        var j = 0
        var ok = true
        while (ok && j < len) {
          var b = bytes(off + j)
          if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
          ok = b == sw(j)
          j += 1
        }
        if (ok) return s
      }
      s += 1
    }
    -1
  }

  def compute(text: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length

    // ---- word pass (ASCII-whitespace-delimited runs) ----
    var nWords = 0L
    var wordLenSum = 0L
    var alphaWords = 0L
    var stopMask = 0L
    var tokStart = -1
    var i = 0
    def closeWord(end: Int): Unit = if (tokStart >= 0) {
      nWords += 1
      wordLenSum += numChars(bytes, tokStart, end - tokStart)
      var j = tokStart
      var alpha = false
      while (!alpha && j < end) {
        val b = bytes(j)
        alpha = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
        j += 1
      }
      if (alpha) alphaWords += 1
      val s = stopIndex(bytes, tokStart, end - tokStart, stops)
      if (s >= 0) stopMask |= 1L << s
      tokStart = -1
    }
    while (i < n) {
      val b = bytes(i)
      if (b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0D) closeWord(i)
      else if (tokStart < 0) tokStart = i
      i += 1
    }
    closeWord(n)

    // ---- whole-text symbol pass ----
    // '...' and '…' are disjoint byte patterns, so one leftmost
    // non-overlapping scan over both equals two independent counts.
    var nHashes = 0L
    var nEllipses = 0L
    i = 0
    while (i < n) {
      if (bytes(i) == '#') { nHashes += 1; i += 1 }
      else if (bytes(i) == '.' && i + 2 < n && bytes(i + 1) == '.' && bytes(i + 2) == '.') {
        nEllipses += 1; i += 3
      } else if (bytes(i) == 0xE2.toByte && i + 2 < n &&
          bytes(i + 1) == 0x80.toByte && bytes(i + 2) == 0xA6.toByte) {
        nEllipses += 1; i += 3
      } else i += 1
    }

    // ---- line pass (0x0A-delimited, empties kept) ----
    var nLines = 0L
    var bulletLines = 0L
    var ellipsisLines = 0L
    var lineCharSum = 0L
    val lineCounts = new java.util.HashMap[String, Int]()
    val lineVals = new java.util.ArrayList[String]()
    val lineChars = new java.util.ArrayList[Int]()
    var lineStart = 0
    i = 0
    def closeLine(end: Int): Unit = {
      nLines += 1
      val chars = numChars(bytes, lineStart, end - lineStart)
      lineCharSum += chars
      // ltrim spaces for the bullet check
      var a = lineStart
      while (a < end && bytes(a) == 0x20) a += 1
      if (a < end) {
        val b = bytes(a)
        val bullet = b == '-' || b == '*' ||
          (b == 0xE2.toByte && a + 2 < end &&
            bytes(a + 1) == 0x80.toByte && bytes(a + 2) == 0xA2.toByte)
        if (bullet) bulletLines += 1
      }
      // rtrim spaces for the ellipsis check
      var z = end
      while (z > lineStart && bytes(z - 1) == 0x20) z -= 1
      val dots3 = z - lineStart >= 3 && bytes(z - 1) == '.' &&
        bytes(z - 2) == '.' && bytes(z - 3) == '.'
      val hellip = z - lineStart >= 3 && bytes(z - 3) == 0xE2.toByte &&
        bytes(z - 2) == 0x80.toByte && bytes(z - 1) == 0xA6.toByte
      if (dots3 || hellip) ellipsisLines += 1
      val v = new String(bytes, lineStart, end - lineStart,
        java.nio.charset.StandardCharsets.UTF_8)
      lineCounts.merge(v, 1, Integer.sum)
      lineVals.add(v)
      lineChars.add(chars)
      lineStart = end + 1
    }
    while (i < n) {
      if (bytes(i) == 0x0A) closeLine(i)
      i += 1
    }
    closeLine(n)
    var dupLineCharSum = 0L
    i = 0
    while (i < lineVals.size()) {
      if (lineCounts.get(lineVals.get(i)) > 1) dupLineCharSum += lineChars.get(i)
      i += 1
    }

    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, wordLenSum, alphaWords,
        java.lang.Long.bitCount(stopMask).toLong, nHashes, nEllipses,
        nLines, bulletLines, ellipsisLines, lineCharSum,
        lineCounts.size().toLong, dupLineCharSum))
  }
}
