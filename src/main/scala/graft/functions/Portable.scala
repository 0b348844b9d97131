package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash and vector-math column builders whose results are reproducible in
  * ANSI SQL on other engines (the DuckDB oracle), so hash-dependent
  * operators (MinHash, SimHash, fingerprints) stay hash-match checkable.
  *
  * All hashes are md5-prefix based: md5 is bit-identical everywhere, and
  * a 15-hex-digit (60-bit) or 8-hex-digit (32-bit) prefix parses into a
  * non-negative BIGINT in both Spark (`conv(hex,16,10)`) and DuckDB
  * (`CAST('0x'||hex AS BIGINT)`).
  */
object Portable {

  /** 60-bit portable hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** 32-bit portable hash of a string column (safe to multiply by a
    * <2^30 constant without 64-bit overflow). */
  def hash32(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 8), 16, 10).cast("long")

  /** Mersenne prime 2^31−1; modulus of the MinHash permutation family. */
  val MinHashPrime: Long = 2147483647L

  /** The i-th universal-hash permutation of a 32-bit token hash:
    * (a_i·h + b_i) mod p, with a_i < 2^30 so a_i·h < 2^62 never
    * overflows. Coefficients are fixed literals so Spark and the oracle
    * agree. */
  def minHashPerm(h: Column, i: Int): Column = {
    val (a, b) = minHashCoeffs(i)
    pmod(h * lit(a) + lit(b), lit(MinHashPrime))
  }

  def minHashCoeffs(i: Int): (Long, Long) = {
    val a = (1000003L * (i + 1) + 334214459L) % (1L << 30)
    val b = (7000003L * (i + 1) + 94387L) % MinHashPrime
    (if (a % 2 == 0) a + 1 else a, b)
  }

  /** Driver-side md5 parity of a literal string: lowest bit of the first
    * hex digit. Same value as SQL `CAST('0x'||left(md5(s),1) AS INT) & 1`
    * in the oracle, so constant hash-derived weights (LSH hyperplanes)
    * stay portable. */
  def md5Parity(s: String): Boolean = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) >> 4) & 1) == 1
  }

  /** Cosine similarity of two float-array columns, accumulated in DOUBLE
    * in array order. Uses the codegen'd [[FloatVectorDot]] expression —
    * same left-to-right fold as `aggregate(zip_with(...))`, so results
    * are bit-identical to the HOF formulation, but it stays inside
    * whole-stage codegen (the HOF lambda plumbing does not). */
  // null (not an ANSI divide-by-zero abort) for zero-norm vectors.
  // One fused kernel, not when(denom === 0, …).otherwise(ab / denom)
  // over three FloatVectorDot calls: the branch duplication re-ran the
  // norm dots per pair (codegen CSE stops at conditional branches) and
  // the composed form read each array three times. Fold-for-fold
  // identical arithmetic — see FloatVectorCosine.
  def cosine(a: Column, b: Column): Column = FloatVectorCosine(a, b)
}
