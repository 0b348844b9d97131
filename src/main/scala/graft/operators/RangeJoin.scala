package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable non-equi (range/interval) joins.
  *
  * Spark plans a bare `a.value BETWEEN b.lo AND b.hi` join as
  * BroadcastNestedLoopJoin — O(|probe|·|intervals|) comparisons and a
  * broadcast of one whole side, which falls over as soon as the interval
  * side stops fitting in memory. The standard scalable rewrite buckets
  * the range dimension: each interval registers in every fixed-width
  * bucket it overlaps, each probe row lands in exactly one bucket, and
  * the join becomes an EQUI-join on the bucket key (shuffle-partitioned
  * like any other) followed by an exact residual filter. Cost is
  * O(rows + interval-span/width) and both sides scale out.
  *
  * Pick `bucketWidth` near the typical interval length: too small
  * multiplies interval replication, too large multiplies residual
  * comparisons per bucket.
  */
object RangeJoin {

  /** Join probe rows to every half-open interval [loCol, hiCol) that
    * contains `probeCol`. All of `intervals`' columns are kept; bucket
    * plumbing stays internal. Intervals with hi <= lo match nothing. */
  def bucketedRangeJoin(
      probe: DataFrame, probeCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucketOf(c: Column): Column = floor(c / bucketWidth).cast("long")
    // hi is exclusive but floor(hi/w) is kept: the boundary bucket may
    // contain values just below hi. The residual filter drops any
    // overreach, so one possibly-empty extra registration is the whole
    // cost of staying float-safe (no epsilon arithmetic).
    val expanded = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("__bucket",
        explode(sequence(bucketOf(col(loCol)), bucketOf(col(hiCol)))))
    val probed = probe.withColumn("__bucket", bucketOf(col(probeCol)))
    // frame-qualified refs: the residual filter must resolve even when
    // probe and intervals share column names
    probed
      .join(expanded, "__bucket")
      .filter(probed(probeCol) >= expanded(loCol) && probed(probeCol) < expanded(hiCol))
      .drop("__bucket")
  }
}
