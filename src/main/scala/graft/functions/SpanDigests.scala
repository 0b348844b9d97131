package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd span decomposition of a text column: one pass over the
  * row's UTF-8 bytes emits, per consecutive `spanTokens`-token span,
  * `struct(span_no, [span_text,] span_digest)` — the per-row step of
  * span-level dedup (census and removal).
  *
  * Semantics are EXACTLY the SQL-primitive formulation the DuckDB
  * oracles replicate: tokens split on the single byte 0x20 with empties
  * dropped; `span_text = concat_ws(' ', slice(tokens, i·n+1, n))`
  * (tokens re-joined by ONE space — runs of spaces in the input
  * collapse); `span_digest = md5(span_text)` as lowercase hex. The
  * replaced formulation ran `transform`/`slice`/`concat_ws` through
  * interpreted higher-order-function lambdas per span; this is one
  * compiled loop with one md5 per span and no token-array
  * materialization. Zero-token text yields an empty array; null text
  * yields null.
  *
  * `withText = false` (the census path) omits `span_text` from the
  * output struct so the exploded stream carries digests only — at
  * 100 TB the downstream shuffle never moves document bodies.
  */
case class SpanDigests(child: Expression, spanTokens: Int, withText: Boolean)
    extends UnaryExpression {

  require(spanTokens >= 1, "spanTokens must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = SpanDigests.schema(withText)

  override def prettyName: String = "span_digests"

  override def nullSafeEval(input: Any): Any =
    SpanDigests.compute(input.asInstanceOf[UTF8String], spanTokens, withText)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SpanDigests.compute($c, $spanTokens, $withText);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SpanDigests {

  def schema(withText: Boolean): DataType = {
    val fields =
      if (withText) Seq(
        StructField("span_no", LongType, nullable = false),
        StructField("span_text", StringType, nullable = false),
        StructField("span_digest", StringType, nullable = false))
      else Seq(
        StructField("span_no", LongType, nullable = false),
        StructField("span_digest", StringType, nullable = false))
    ArrayType(StructType(fields), containsNull = false)
  }

  def apply(text: Column, spanTokens: Int, withText: Boolean): Column =
    GraftColumnBridge.toColumn(
      SpanDigests(GraftColumnBridge.toExpression(text), spanTokens, withText))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  private def hexString(digest: Array[Byte]): UTF8String = {
    val out = new Array[Byte](digest.length * 2)
    var i = 0
    while (i < digest.length) {
      out(2 * i) = hex((digest(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = hex(digest(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def compute(text: UTF8String, spanTokens: Int, withText: Boolean): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val md = md5.get()
    val spans = new scala.collection.mutable.ArrayBuffer[Any]()
    // normalized span bytes (tokens joined by single 0x20)
    var buf = new Array[Byte](256)
    var bufLen = 0
    var tokInSpan = 0
    var spanNo = 0L
    def ensure(extra: Int): Unit =
      if (bufLen + extra > buf.length) {
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, bufLen + extra))
      }
    def flushSpan(): Unit = {
      if (tokInSpan > 0) {
        md.reset()
        md.update(buf, 0, bufLen)
        val spanBytes = java.util.Arrays.copyOf(buf, bufLen)
        val digest = hexString(md.digest())
        spans += (if (withText)
          InternalRow(spanNo, UTF8String.fromBytes(spanBytes), digest)
        else InternalRow(spanNo, digest))
        spanNo += 1L
        bufLen = 0
        tokInSpan = 0
      }
    }
    var i = 0
    var tokStart = -1
    while (i <= n) {
      val isSep = i == n || bytes(i) == 0x20
      if (isSep) {
        if (tokStart >= 0) {
          val tokLen = i - tokStart
          ensure(tokLen + 1)
          if (tokInSpan > 0) { buf(bufLen) = 0x20; bufLen += 1 }
          System.arraycopy(bytes, tokStart, buf, bufLen, tokLen)
          bufLen += tokLen
          tokInSpan += 1
          tokStart = -1
          if (tokInSpan == spanTokens) flushSpan()
        }
      } else if (tokStart < 0) {
        tokStart = i
      }
      i += 1
    }
    flushSpan() // trailing partial span
    new GenericArrayData(spans.toArray)
  }
}
