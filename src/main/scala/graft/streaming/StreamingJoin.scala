package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time interval joins that run UNCHANGED on batch and streaming
  * frames — the attribution shape (clicks matched to the impressions
  * they followed within a horizon).
  *
  * The operator only declares the join: an equi-key plus an event-time
  * interval. On static frames Catalyst executes it as an ordinary
  * equi-join with a range residual. On two `readStream` frames that
  * carry `withWatermark` columns, the SAME plan becomes Spark's
  * state-bounded stream-stream join: the interval condition gives the
  * engine the bound it needs to evict left rows once the right
  * watermark passes `left_ts + within` (and vice versa), so join state
  * is O(horizon × rate), independent of stream length — the property
  * that makes the shape survive an unbounded 100 TB/day event feed.
  *
  * Declaring the plan once and letting the engine pick batch vs
  * streaming execution is the whole point of the Dataset API here; a
  * hand-built streaming join would duplicate the batch semantics and
  * then have to prove them equal. StreamingSpec instead proves the
  * single implementation equal to itself across both modes on sliced
  * feeds.
  */
object StreamingJoin {

  /** All (left, right) pairs with equal `keyCol` and
    * `rightTs ∈ [leftTs, leftTs + within]`. `within` is a SQL interval
    * string ("10 minutes"). Both input frames keep their columns; the
    * right key column is dropped after the join (it equals the left's).
    *
    * Streaming callers apply `withWatermark` to BOTH inputs before
    * calling (the engine requires it for state eviction in append
    * mode); batch callers pass plain frames.
    *
    * The join condition resolves each timestamp against ITS OWN frame
    * (`left(leftTs)` / `r(rightTs)`), so inputs that happen to share a
    * column name beyond the key (e.g. both carry `ts`) still analyze;
    * the joined output then simply contains both same-named columns,
    * left's first — rename before calling if downstream needs to
    * address them individually. `rightTs` must name a column of
    * `right` and `leftTs` one of `left`; a swapped pair fails here
    * rather than silently resolving across frames. */
  def joinWithin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, within: String): DataFrame = {
    val rk = s"__r_$keyCol"
    val r = right.withColumnRenamed(keyCol, rk)
    left.join(r,
        left(keyCol) === r(rk) &&
          r(rightTs) >= left(leftTs) &&
          r(rightTs) <= left(leftTs) + expr(s"interval $within"))
      .drop(rk)
  }
}
