package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd SimHash fingerprint of a gram-hash array: the classic
  * frequency-weighted bit-vote — every gram OCCURRENCE votes ±1 per bit
  * position of its 60-bit hash, fingerprint bit b is set when the vote
  * sum is positive — computed in one compiled loop per row.
  *
  * Bit votes use [[Portable.hash60]] of the gram hash's DECIMAL STRING
  * (md5 of the base-10 digits, first 15 hex digits = the digest's first
  * 60 bits), bit-identical to the SQL formulation the DuckDB oracle
  * replicates. Like [[MinHashFromGrams]], the fingerprint is a pure
  * function of one document's grams, so this removes the aggregate
  * formulation's full shingle-stream shuffle keyed by doc id; feed the
  * MULTISET gram array (`distinct = false`) — frequency weighting is
  * the semantics. An empty gram array yields NULL (the aggregate
  * formulation emitted no row; callers filter).
  */
case class SimHashFromGrams(child: Expression, bits: Int) extends UnaryExpression {

  require(bits >= 1 && bits <= 60, "bits must be in 1..60 (hash60 source)")

  // SQL-reachable via GraftExtensions: reject non-long arrays AND
  // nullable-element arrays (a null element would vote as gram 0
  // silently) at analysis.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectNonNullArrayOf(prettyName, "grams", child,
      org.apache.spark.sql.types.LongType)

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "simhash_from_grams"

  override def nullSafeEval(input: Any): Any =
    SimHashFromGrams.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("fp")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |Long $boxed = graft.functions.SimHashFromGrams.compute($c, $bits);
         |if ($boxed == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFromGrams {

  def apply(grams: Column, bits: Int): Column =
    GraftColumnBridge.toColumn(
      SimHashFromGrams(GraftColumnBridge.toExpression(grams), bits))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Fingerprint for one row's grams; null (boxed) when empty. Entry
    * point for interpreted eval and generated code. */
  def compute(grams: ArrayData, bits: Int): java.lang.Long = {
    val m = grams.numElements()
    if (m == 0) return null
    val digest = md5.get()
    val votes = new Array[Int](bits)
    var g = 0
    while (g < m) {
      // hash60 of the gram's base-10 string: md5 of the ASCII digits,
      // first 15 hex chars = the digest's first 60 bits = (first 8
      // bytes big-endian) >>> 4.
      val s = java.lang.Long.toString(grams.getLong(g))
      digest.reset()
      digest.update(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val d = digest.digest()
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < bits) {
        if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      g += 1
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }
}
