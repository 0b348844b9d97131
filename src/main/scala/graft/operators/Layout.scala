package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton) clustering, the
  * lakehouse primitive (Delta OPTIMIZE ZORDER, Iceberg sort orders)
  * that makes min/max footer statistics selective on MORE THAN ONE
  * column at once.
  *
  * Why it matters at 100 TB: a scan with a predicate on column y over
  * files sorted by column x reads EVERY file — each file's y-range is
  * the full domain. Interleaving the bits of both dimensions' bucket
  * ids gives a 1-D sort key whose contiguous ranges are small
  * axis-aligned rectangles, so every file is tight in BOTH dimensions
  * and either predicate prunes ~√(selectivity) of the files from the
  * footer stats alone — no index structure, no extra storage, just
  * row order.
  *
  * Everything here is engine-portable arithmetic (fixed-width buckets
  * off the frame's own min/max, integer bit shuffles), so the full
  * address computation is oracle-replayable bit-for-bit.
  */
object Layout {

  /** Morton interleave of two bucket ids (each in [0, 2^bits)): bit i
    * of `bx` lands at position 2i, bit i of `by` at 2i+1 — the
    * [[graft.functions.MortonInterleave]] kernel (magic-number bit
    * spread, O(log bits) shifts per row; also SQL-registered as
    * `morton_interleave`). */
  def interleave(bx: Column, by: Column, bits: Int): Column =
    graft.functions.MortonInterleave(bx, by, bits)

  /** Fixed-width bucket of `v` into [0, 2^bits) between `lo` and `hi`
    * (inclusive domain edges; a degenerate hi == lo collapses to
    * bucket 0). The division is one shared IEEE double op on every
    * engine — the rel_histogram discipline. */
  private def bucket(v: Column, lo: Column, hi: Column, bits: Int): Column = {
    val n = (1L << bits).toDouble
    when(hi === lo, lit(0L)).otherwise(
      least(lit((1L << bits) - 1),
        floor((v - lo) / ((hi - lo) / lit(n))).cast("long")))
  }

  /** Annotate `df` with both bucket ids and the z-address. Bounds come
    * from the frame's own min/max — one tiny aggregate that rides in
    * as a lazy broadcast (no driver action), exactly the lmScores
    * vocab-frame shape. Numeric inputs are cast to double first so
    * decimal/int/timestamp-derived dimensions share one bucket rule. */
  def zAddress(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 12): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val bounds = df.agg(
      min(x).as("__xlo"), max(x).as("__xhi"),
      min(y).as("__ylo"), max(y).as("__yhi"))
    df.crossJoin(broadcast(bounds))
      .withColumn("zx", bucket(x, col("__xlo"), col("__xhi"), bits))
      .withColumn("zy", bucket(y, col("__ylo"), col("__yhi"), bits))
      .withColumn("zaddr", interleave(col("zx"), col("zy"), bits))
      .drop("__xlo", "__xhi", "__ylo", "__yhi")
  }

  /** Write `df` clustered by z-address into ~`files` files: range
    * partition on the address (contiguous z-ranges = axis-aligned
    * tiles), sort within each partition so row groups inherit the
    * locality too. The write-side twin of the footer-stats pruning a
    * reader gets for free. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      files: Int, bits: Int = 12): Unit =
    zAddress(df, xCol, yCol, bits)
      .repartitionByRange(files, col("zaddr"))
      .sortWithinPartitions("zaddr")
      .drop("zx", "zy", "zaddr")
      .write.mode("overwrite").parquet(path)
}
