package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd order-sensitive document fingerprint: the positional
  * rolling hash `(Σ (i+1)·hash32(token_i) mod p) mod p` of a text
  * column, computed per ROW in one compiled loop — token semantics and
  * hash identical to [[ShingleHashes]] (split on space, empties
  * dropped, md5-prefix [[Portable.hash32]]), per-token terms reduced
  * `mod p` before summing exactly like the SQL formulation the DuckDB
  * oracle runs, so values hash-match.
  *
  * This replaces a posexplode → per-token projection → groupBy(doc)
  * aggregate: the fingerprint is a pure function of the text, so
  * computing it as a projection removes the row explosion AND the
  * doc-keyed shuffle entirely — at 100 TB the operator becomes
  * scan-shaped. Texts with zero tokens yield NULL (the aggregate
  * formulation emitted no row; callers filter nulls to match).
  */
case class TextFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  // SQL-reachable via GraftExtensions: reject non-string input at analysis.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "text", child)

  override def prettyName: String = "text_fingerprint"

  override def nullSafeEval(input: Any): Any =
    TextFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("fp")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Long $boxed = graft.functions.TextFingerprint.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFingerprint {

  def apply(text: Column): Column =
    GraftColumnBridge.toColumn(TextFingerprint(GraftColumnBridge.toExpression(text)))

  /** Positional fingerprint of one row; null (boxed) when the text has
    * no tokens — the caller's aggregate formulation had no group to
    * emit. Tokenization and per-token hashing go through the SHARED
    * [[ShingleHashes.tokenHashes]] loop (one copy of the oracle-pinned
    * token semantics); this kernel only adds the positional fold.
    * Entry point for both interpreted eval and generated code. */
  def compute(text: UTF8String): java.lang.Long = {
    val (hashes, m) = ShingleHashes.tokenHashes(text.getBytes)
    if (m == 0) return null
    val p = Portable.MinHashPrime
    var sum = 0L
    var i = 0
    while (i < m) {
      sum += java.lang.Math.floorMod((i + 1L) * hashes(i), p)
      i += 1
    }
    java.lang.Long.valueOf(java.lang.Math.floorMod(sum, p))
  }
}
