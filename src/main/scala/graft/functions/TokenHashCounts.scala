package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-row token term-frequency map: `array<struct<w, m>>` of
  * the row's DISTINCT token hashes with multiplicities, sorted by hash
  * ascending — the row-local equivalent of
  * `explode(shingle_hashes(text, 1)) → groupBy(id, w) → count(*)`.
  *
  * Why it exists: that groupBy is an EXCHANGE of the entire token
  * instance frame — at corpus scale, the widest shuffle in any
  * bag-of-words consumer (Naive Bayes scoring, TF-IDF, BM25). Term
  * frequency within a document depends only on that document's text,
  * so it belongs in the row kernel: one md5 per token, one in-row
  * sort + run-length encode, zero bytes moved. Downstream consumers
  * `explode` the already-counted pairs, so the (doc, token) frame
  * enters the plan pre-aggregated and any further aggregation moves
  * `distinct-tokens × 16 bytes` per row instead of
  * `token-instances × row-width`.
  *
  * Token and hash semantics are EXACTLY [[ShingleHashes]]' n = 1 path
  * (single shared `tokenHashes` loop: split on 0x20, drop empties,
  * [[Portable.hash32]] per token), so the oracle's
  * `substr(md5(token), 1, 8)` replay and every shingle consumer agree
  * with this kernel by construction.
  *
  * Empty text yields an empty array; null text yields null.
  */
case class TokenHashCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def dataType: DataType = TokenHashCounts.schema

  override def prettyName: String = "token_hash_counts"

  override def nullSafeEval(input: Any): Any =
    TokenHashCounts.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenHashCounts.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenHashCounts {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("w", LongType, nullable = false),
    StructField("m", LongType, nullable = false))), containsNull = false)

  def apply(text: Column): Column =
    GraftColumnBridge.toColumn(
      TokenHashCounts(GraftColumnBridge.toExpression(text)))

  def compute(text: UTF8String): ArrayData = {
    val (hashes, m) = ShingleHashes.tokenHashes(text.getBytes)
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val a = java.util.Arrays.copyOf(hashes, m)
    java.util.Arrays.sort(a)
    val out = new scala.collection.mutable.ArrayBuffer[Any](math.min(m, 64))
    var runStart = 0
    var i = 1
    while (i <= m) {
      if (i == m || a(i) != a(runStart)) {
        out += InternalRow(a(runStart), (i - runStart).toLong)
        runStart = i
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
