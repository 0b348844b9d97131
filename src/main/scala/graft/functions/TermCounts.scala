package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd single-pass document length + per-literal-term term
  * frequencies: `array<long>` of `[dl, tf_0, …, tf_{q-1}]` from ONE
  * scan of the row's UTF-8 bytes — the scan-side kernel under
  * [[graft.operators.TextAnalysis.bm25TopK]]-shaped retrieval, where
  * the query terms are literals known at plan time.
  *
  * Replaces the `split()` array materialization plus q per-term
  * `filter(…)` array walks (each of which re-traverses the token array
  * with an interpreted lambda) with one compiled loop and zero
  * per-token allocation. Semantics are IDENTICAL to the SQL
  * primitives they replace — the DuckDB oracle keeps hash-matching
  * unchanged:
  *
  *  - `dl`   = `size(filter(split(text, " "), t -> t <> ""))` —
  *    maximal runs delimited by the single byte 0x20 (which never
  *    occurs inside a multi-byte UTF-8 sequence)
  *  - `tf_i` = `size(filter(tokens, t -> t == terms(i)))` — tokens
  *    byte-equal to the i-th term, with multiplicity
  *
  * Null text yields null; empty text yields all zeros — exactly the
  * split/filter formulation's behavior. [[TextStats]] is the same
  * loop shape with aggregated stopword hits; this kernel keeps the
  * per-term resolution BM25's per-term idf/saturation needs.
  */
case class TermCounts(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  require(terms.nonEmpty, "terms must be non-empty")
  // fail at construction, matching the SQL registration's literal
  // check — a null term would otherwise NPE later in toStopBytes
  require(terms.forall(_ != null), "terms must not contain null")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "term_counts"

  @transient private lazy val termBytes: Array[Array[Byte]] =
    TextStats.toStopBytes(terms)

  override def nullSafeEval(input: Any): Any =
    TermCounts.compute(input.asInstanceOf[UTF8String], termBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val termsRef = ctx.addReferenceObj("terms", termBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TermCounts.compute($c, $termsRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {

  def apply(text: Column, terms: Seq[String]): Column =
    GraftColumnBridge.toColumn(
      TermCounts(GraftColumnBridge.toExpression(text), terms))

  def compute(text: UTF8String, terms: Array[Array[Byte]]): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    val out = new Array[Long](terms.length + 1)
    var tokStart = -1
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) {
        if (tokStart >= 0) {
          tally(bytes, tokStart, i - tokStart, terms, out)
          tokStart = -1
        }
      } else if (tokStart < 0) tokStart = i
      i += 1
    }
    if (tokStart >= 0) tally(bytes, tokStart, n - tokStart, terms, out)
    new GenericArrayData(out)
  }

  private def tally(bytes: Array[Byte], off: Int, len: Int,
      terms: Array[Array[Byte]], out: Array[Long]): Unit = {
    out(0) += 1L
    var t = 0
    while (t < terms.length) {
      val tb = terms(t)
      if (tb.length == len) {
        var j = 0
        while (j < len && bytes(off + j) == tb(j)) j += 1
        if (j == len) out(t + 1) += 1L
      }
      t += 1
    }
  }
}
