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

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Positional fingerprint of one row; null (boxed) when the text has
    * no tokens — the caller's aggregate formulation had no group to
    * emit. Entry point for both interpreted eval and generated code. */
  def compute(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val digest = md5.get()
    val p = Portable.MinHashPrime
    var sum = 0L
    var pos = 0L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          digest.reset()
          digest.update(bytes, start, i - start)
          val d = digest.digest()
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          pos += 1L
          sum += java.lang.Math.floorMod(pos * h, p)
        }
        start = i + 1
      }
      i += 1
    }
    if (pos == 0L) null else java.lang.Long.valueOf(java.lang.Math.floorMod(sum, p))
  }
}
