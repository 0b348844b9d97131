package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass text statistics: every count the quality/token
  * profile needs, from ONE scan of the row's UTF-8 bytes.
  *
  * Replaces the profile projection's three `split()` array
  * materializations plus a `regexp_replace` scan (each of which
  * allocates a token array or a rewritten string per row) with one
  * compiled loop and zero allocation. Semantics are IDENTICAL to the
  * SQL primitives they replace — the DuckDB oracle for every profile
  * consumer keeps hash-matching unchanged:
  *
  *  - `n_chars`      = `length(text)` — codepoints, counted as UTF-8
  *    lead bytes (any byte not `10xxxxxx`)
  *  - `n_tokens`     = `size(filter(split(text, " "), t -> t <> ""))` —
  *    maximal runs delimited by the single byte 0x20, which never
  *    occurs inside a multi-byte UTF-8 sequence
  *  - `n_stop`       = tokens byte-equal to one of the constructor's
  *    `stopwords` (with multiplicity)
  *  - `n_digits`     = `length(text) - length(regexp_replace(text,
  *    "[0-9]", ""))` — ASCII digits only, exactly the regex class
  *  - `word_tokens`  = `size(filter(split(text, "[^a-zA-Z0-9]+"),
  *    t -> t <> ""))` — maximal ASCII-alphanumeric runs
  *
  * Null text yields a null struct (the split/regex formulations all
  * propagate null the same way). Empty text yields all zeros.
  */
case class TextStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = TextStats.schema

  override def prettyName: String = "text_stats"

  @transient private lazy val stopBytes: Array[Array[Byte]] =
    TextStats.toStopBytes(stopwords)

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String], stopBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStats.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("word_tokens", IntegerType, nullable = false)))

  def apply(text: Column, stopwords: Seq[String]): Column =
    GraftColumnBridge.toColumn(
      TextStats(GraftColumnBridge.toExpression(text), stopwords))

  def toStopBytes(stopwords: Seq[String]): Array[Array[Byte]] =
    stopwords.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  def compute(text: UTF8String, stops: Array[Array[Byte]]): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var nChars = 0
    var nTokens = 0
    var nStop = 0
    var nDigits = 0
    var wordTokens = 0
    var tokStart = -1 // byte offset of the current space-token, -1 = none
    var inWord = false // inside an [A-Za-z0-9] run
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if ((b & 0xc0) != 0x80) nChars += 1
      if (b == 0x20) {
        if (tokStart >= 0) {
          nTokens += 1
          if (isStop(bytes, tokStart, i - tokStart, stops)) nStop += 1
          tokStart = -1
        }
        inWord = false
      } else {
        if (tokStart < 0) tokStart = i
        val alnum = (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')
        if (b >= '0' && b <= '9') nDigits += 1
        if (alnum && !inWord) wordTokens += 1
        inWord = alnum
      }
      i += 1
    }
    if (tokStart >= 0) {
      nTokens += 1
      if (isStop(bytes, tokStart, n - tokStart, stops)) nStop += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTokens, nStop, nDigits, wordTokens))
  }

  private def isStop(bytes: Array[Byte], off: Int, len: Int,
      stops: Array[Array[Byte]]): Boolean = {
    var s = 0
    while (s < stops.length) {
      val sw = stops(s)
      if (sw.length == len) {
        var j = 0
        while (j < len && bytes(off + j) == sw(j)) j += 1
        if (j == len) return true
      }
      s += 1
    }
    false
  }
}
