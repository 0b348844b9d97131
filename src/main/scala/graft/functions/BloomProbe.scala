package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter probe: build with [[build]], probe with
  * [[mightContain]] — a matched pair around Spark's own
  * `BloomFilterMightContain` expression (the one its runtime join
  * filters use), so the per-row membership test stays inside
  * whole-stage codegen instead of dropping to a Scala `udf`.
  *
  * The pairing contract: `BloomFilterMightContain` probes with
  * `mightContainLong`, so the filter must hold the XXH64 hashes of the
  * values, not the values' own bytes. [[build]] therefore aggregates
  * `xxhash64(value)` (executor-side tree aggregation via
  * `DataFrameStatFunctions.bloomFilter`, only the bits reach the
  * driver) and [[mightContain]] probes with `xxhash64(value)` — both
  * sides derive the hash from the SAME deterministic expression, so
  * retried tasks route identically and the false-positive set is a
  * fixed function of the built filter.
  *
  * Distribution: the serialized filter rides the plan as a
  * `BinaryType` literal, which Spark ships to executors through the
  * task-binary broadcast — the same one-copy-per-executor transport an
  * explicit `broadcast()` of the filter object used; the expression
  * deserializes it once per task (lazy), never per row.
  *
  * Null values hash to the seed's hash (`xxhash64` skips nulls rather
  * than returning null), so a null routes deterministically to one
  * side — and in the route-then-verify shapes both sides agree that a
  * null digest never equi-joins a seen digest, so routing cannot
  * change results (the Bloom-routes-never-decides invariant).
  */
object BloomProbe {

  /** Build a Bloom filter of `xxhash64(value)` over `df` — the build
    * half of the [[mightContain]] pairing. */
  def build(df: DataFrame, value: Column, expectedItems: Long, fpp: Double): BloomFilter =
    df.stat.bloomFilter(xxhash64(value), expectedItems, fpp)

  /** Codegen membership probe against a filter built by [[build]].
    * Returns a boolean Column usable anywhere a predicate is. */
  def mightContain(filter: BloomFilter, value: Column): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    GraftColumnBridge.toColumn(BloomFilterMightContain(
      Literal.create(out.toByteArray, BinaryType),
      GraftColumnBridge.toExpression(xxhash64(value))))
  }
}
