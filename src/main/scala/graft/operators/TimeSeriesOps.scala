package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators the reference's forecast domain needs beyond
  * its own SQL surface (and that Spark lacks as built-ins): as-of join,
  * gap-fill resampling, and per-series delta/rate. Each is composed
  * from built-in operators in the shape that scales: one shuffle keyed
  * by series, no range-join blowup, no driver-side loops.
  */
object TimeSeriesOps {

  /** As-of join: for every left row, the matching right row within the
    * same key by `direction`:
    *
    *  - `backward` (default): latest right with `right.ts <= left.ts` —
    *    "last value known when this event happened";
    *  - `forward`: earliest right with `right.ts >= left.ts` — "next
    *    observation after this event";
    *  - `nearest`: whichever of the two is closer in time, ties to
    *    backward.
    *
    * Planned as the union-and-sweep pattern rather than a range join:
    * tag both sides, sort each series by (ts, side) so same-ts right
    * rows land on the inclusive side of the comparison, and carry the
    * neighboring right value with one window per direction. One shuffle
    * on the key, linear in rows — a range-join formulation would rescan
    * the right side per left row (`nearest` costs a second sort over
    * the same exchange, never a second shuffle).
    *
    * `left`/`right` must share `keyCol` and `tsCol`; the right side
    * contributes `valueCol` (emitted as `asof_value`, null when no
    * right row qualifies). Ties on (key, ts) among right rows break
    * deterministically toward the greatest value in every direction.
    */
  def asOfJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value", direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.filterNot(c => c == keyCol || c == tsCol)
    // Right values travel wrapped in a struct: a right row whose VALUE is
    // null must still count as a match (and carry its null forward) —
    // bare-null carrying would make last/first(ignoreNulls) skip it and
    // resurrect a different value. The struct also carries the matched
    // right ts (`rts`) so `nearest` can compare distances.
    val l = left.select(
      col(keyCol), col(tsCol), lit(1).as("_side"),
      struct(leftCols.map(col): _*).as("_payload"),
      lit(null).cast(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rts", right.schema(tsCol).dataType),
        org.apache.spark.sql.types.StructField("v", right.schema(valueCol).dataType))))
        .as("_rv"))
    val r = right.select(
      col(keyCol), col(tsCol), lit(0).as("_side"),
      lit(null).cast(l.schema("_payload").dataType).as("_payload"),
      struct(col(tsCol).as("rts"), col(valueCol).as("v")).as("_rv"))
    val u = l.unionByName(r)
    // backward sweep: right rows sort BEFORE left on equal ts (side asc)
    // ⇒ at-or-before is inclusive; last non-null in the prefix wins.
    val wb = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"), col("_rv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward sweep: right rows sort AFTER left on equal ts (side desc)
    // ⇒ at-or-after is inclusive; first non-null in the suffix wins.
    // _rv desc keeps the greatest-value tie-break (first hit = greatest).
    val wf = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side").desc, col("_rv").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val withPick = direction match {
      case "backward" =>
        u.withColumn("_pick", last(col("_rv"), ignoreNulls = true).over(wb))
      case "forward" =>
        u.withColumn("_pick", first(col("_rv"), ignoreNulls = true).over(wf))
      case "nearest" =>
        u.withColumn("_b", last(col("_rv"), ignoreNulls = true).over(wb))
          .withColumn("_f", first(col("_rv"), ignoreNulls = true).over(wf))
          .withColumn("_pick",
            when(col("_f").isNull, col("_b"))
              .when(col("_b").isNull, col("_f"))
              .when(unix_micros(col(tsCol)) - unix_micros(col("_b.rts")) <=
                unix_micros(col("_f.rts")) - unix_micros(col(tsCol)), col("_b"))
              .otherwise(col("_f")))
          .drop("_b", "_f")
    }
    withPick
      .filter(col("_side") === 1)
      .select(Seq(col(keyCol), col(tsCol)) ++
        leftCols.map(c => col(s"_payload.$c").as(c)) :+
        col("_pick.v").as("asof_value"): _*)
  }

  /** Gap-fill resample: snap each point to a `stepSec` grid over
    * [start, end), take the latest value per (series, bucket), emit a
    * row for EVERY grid bucket of every series, and forward-fill empty
    * buckets from the previous known value (null until the first).
    *
    * The grid is generated per series with `sequence` + `explode` — no
    * driver-side loop — and the fill is one window per series.
    */
  def resampleFill(
      values: DataFrame, stepSec: Long,
      start: java.sql.Timestamp, end: java.sql.Timestamp,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(stepSec > 0, "stepSec must be positive")
    val stepUs = stepSec * 1000000L
    // Exact µs anchor (Timestamp.getTime is ms-precision — a start with
    // sub-ms micros would put grid keys and bucket keys off by the
    // residue and the join would match nothing).
    val startUs = start.toInstant.getEpochSecond * 1000000L + start.toInstant.getNano / 1000L
    val endUs = end.toInstant.getEpochSecond * 1000000L + end.toInstant.getNano / 1000L
    val inRange = values.filter(col(tsCol) >= lit(start) && col(tsCol) < lit(end))
    // The winning value travels in a struct so a bucket whose latest
    // reading is genuinely NULL stays distinguishable from an empty
    // bucket — bare-null carrying would let the forward fill resurrect a
    // stale value over a real null (same guard as asOfJoin's _rv).
    // ArgMaxLatest(ts, ts, value) ≡ max(struct(ts, value)).value
    // (lexicographic max, NaN-greatest, nulls-low) but with a FLAT
    // hash-aggregable buffer — the struct-max formulation silently
    // planned partial+final SortAggregate over the in-range stream
    // (the ReadShapes.latest rationale, see ArgMaxLatest's scaladoc).
    // The flat aggregate's value buffer is double-typed; other value
    // types keep the struct-max path (semantically identical).
    val winner = values.schema(valueCol).dataType match {
      case org.apache.spark.sql.types.DoubleType =>
        graft.functions.ArgMaxLatest(col(tsCol), col(tsCol), col(valueCol))
      case _ => max(struct(col(tsCol), col(valueCol))).getField(valueCol)
    }
    val bucketed = inRange
      .withColumn("bucket", timestamp_micros(
        unix_micros(col(tsCol)) - pmod(unix_micros(col(tsCol)) - lit(startUs), lit(stepUs))))
      .groupBy(col(keyCol), col("bucket"))
      .agg(struct(winner.as("v")).as("_bv"))
    // Grid generated relationally: explode a long sequence then a
    // codegen'd projection to timestamps (a transform() lambda here would
    // evaluate interpreted per element). Bucket count is the CEILING of
    // the span (the final partial bucket holds data too), and the
    // `_i < nBuckets` filter guards the empty-span case (sequence(0,-1)
    // would generate a DESCENDING range).
    val nBuckets = (endUs - startUs + stepUs - 1) / stepUs
    // Grid keys come from the FILTERED frame: series with no data in
    // [start, end) contribute nothing (and the distinct doesn't scan
    // out-of-range history).
    val grid = inRange.select(col(keyCol)).distinct()
      .select(col(keyCol), explode(sequence(lit(0L), lit(math.max(nBuckets - 1, 0L)))).as("_i"))
      .filter(col("_i") < nBuckets)
      .select(col(keyCol),
        timestamp_micros(lit(startUs) + col("_i") * stepUs).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .withColumn("filled_value", last(col("_bv"), ignoreNulls = true).over(w).getField("v"))
      .select(col(keyCol), col("bucket"),
        col("_bv.v").as("bucket_value"), col("filled_value"))
  }

  /** Trailing moving statistics per series: over the last `windowRows`
    * rows (ordered by `tsCol` with `tieCol` breaking timestamp ties
    * deterministically) — moving average, moving sample-stddev, and the
    * z-score of the current value against its own trailing window (the
    * standard streaming anomaly score).
    *
    * Sums run through DECIMAL so the moving average is bit-identical
    * across engines; variance uses the textbook (Σx² − (Σx)²/n)/(n−1)
    * on those exact sums, with a `greatest(·,0)` guard for the tiny
    * negative residue float subtraction can leave. One shuffle on the
    * series key; the frame is rows-based, so state per key is bounded
    * by `windowRows` regardless of data volume.
    */
  def movingStats(
      values: DataFrame, windowRows: Int,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value", tieCol: String = ""): DataFrame = {
    require(windowRows > 1, "windowRows must be > 1")
    val order: Seq[Column] =
      if (tieCol.isEmpty) Seq(col(tsCol)) else Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(-(windowRows - 1), Window.currentRow)
    val keep: Seq[Column] =
      Seq(col(keyCol), col(tsCol)) ++
        (if (tieCol.isEmpty) Nil else Seq(col(tieCol))) :+ col(valueCol)
    // The three window aggregates are materialized in ONE projection so
    // Catalyst plans a single Window node; deriving avg/std/z directly
    // from `.over(w)` expressions in separate withColumns stacks three
    // Window nodes that each re-walk the frame.
    val withSums = values.select(keep ++ Seq(
      count(lit(1)).over(w).as("__n"),
      sum(col(valueCol).cast("decimal(18,6)")).over(w).cast("double").as("__sum"),
      sum((col(valueCol) * col(valueCol)).cast("decimal(28,10)")).over(w)
        .cast("double").as("__sumsq")): _*)
    val ma = col("__sum") / col("__n")
    val variance = when(col("__n") > 1,
      greatest((col("__sumsq") - col("__sum") * col("__sum") / col("__n")) / (col("__n") - 1),
        lit(0.0)))
    val std = sqrt(variance)
    withSums
      .withColumn("moving_avg", round(ma, 6))
      .withColumn("moving_std", round(std, 6))
      // + 0.0 normalizes IEEE signed zero: a last-ulp-negative residue
      // rounds to -0.0 in some engines and 0.0 in others; adding +0.0
      // maps both to +0.0 (and passes null through).
      .withColumn("zscore",
        when(std > 0, round((col(valueCol) - ma) / std, 6) + lit(0.0)))
      .drop("__n", "__sum", "__sumsq")
  }

  /** Union coverage of possibly-overlapping `[start, end)` intervals per
    * key: total covered time and the number of disjoint covered
    * segments — "how long was this series actually active" (session
    * coverage, SLA uptime, sensor availability).
    *
    * The classic sweep, distributed: per key in start order, an
    * interval OPENS a new covered segment iff its start lies beyond the
    * running max end of every earlier interval; the running count of
    * opens is the segment id; coverage = Σ per-segment
    * (max end − min start). Two windows + two aggregates, ALL clustered
    * on the key — one shuffle end to end, linear in intervals (the
    * naive pairwise-overlap formulation is O(n²) per key).
    *
    * Zero/negative-length intervals (end ≤ start) are dropped. Output:
    * (key, n_segments, covered_us).
    */
  def intervalUnionLength(
      intervals: DataFrame,
      keyCol: String = "series_id", startCol: String = "start_ts",
      endCol: String = "end_ts"): DataFrame = {
    val sUs = unix_micros(col(startCol))
    val eUs = unix_micros(col(endCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(sUs, eUs)
    val prevMaxEnd = max(eUs).over(w.rowsBetween(Window.unboundedPreceding, -1))
    val opens = when(prevMaxEnd.isNull || sUs > prevMaxEnd, 1).otherwise(0)
    intervals
      .filter(eUs > sUs)
      .withColumn("__seg",
        sum(opens).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__seg"))
      .agg((max(eUs) - min(sUs)).as("__len"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_segments"), sum(col("__len")).as("covered_us"))
  }

  /** Gap-based sessionization: a new session starts at the first event of
    * a key or after a silence longer than `gapSec`. Appends an increasing
    * per-key `session_no` (1-based). Two windows over ONE shuffle on the
    * key; downstream per-(key, session) aggregation reuses the same
    * partitioning, so a full sessionize-and-summarize is a single
    * exchange end to end. */
  def sessionize(
      events: DataFrame, gapSec: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = ""): DataFrame = {
    require(gapSec > 0, "gapSec must be positive")
    val order: Seq[Column] =
      if (tieCol.isEmpty) Seq(col(tsCol)) else Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val run = Window.partitionBy(col(keyCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col(tsCol), 1).over(w)
    val newSession = when(prevTs.isNull
      || unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSec * 1000000L, 1).otherwise(0)
    events.withColumn("session_no", sum(newSession).over(run))
  }

  /** Seasonal (hour-of-day) baseline per series: the mean value per
    * (key, hour slot) — the seasonal-naive forecast baseline of the
    * reference's domain. DECIMAL sums keep the mean engine-portable.
    * One shuffle on (key, slot). */
  def seasonalProfile(
      values: DataFrame,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame =
    values
      .groupBy(col(keyCol), hour(col(tsCol)).as("slot"))
      .agg(
        (sum(col(valueCol).cast("decimal(18,6)")).cast("double") / count(lit(1)))
          .as("mean_v"),
        count(lit(1)).as("n"))

  /** Each row with its seasonal baseline and residual (value − baseline)
    * — the anomaly signal against "normal for this hour". The profile is
    * far smaller than the data (keys × 24) and broadcasts. Rows with a
    * null key or timestamp keep a null baseline/residual (left join)
    * rather than vanishing. */
  def seasonalResiduals(
      values: DataFrame,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val prof = seasonalProfile(values, keyCol, tsCol, valueCol)
      .select(col(keyCol), col("slot").as("__slot"), col("mean_v").as("__mean_v"))
    values
      .withColumn("__slot", hour(col(tsCol)))
      .join(broadcast(prof), Seq(keyCol, "__slot"), "left")
      // + 0.0 after round: signed-zero normalization (see movingStats)
      .withColumn("seasonal_mean", round(col("__mean_v"), 6))
      .withColumn("residual", round(col(valueCol) - col("__mean_v"), 6) + lit(0.0))
      .drop("__slot", "__mean_v")
  }

  /** Per-series lag features for supervised training: one `lag_k` column
    * per requested offset. All lags share one window spec, so Catalyst
    * collapses them into a single Window node over one shuffle. */
  def lagFeatures(
      values: DataFrame, lags: Seq[Int],
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value", tieCol: String = ""): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ > 0), "lags must be positive")
    val order: Seq[Column] =
      if (tieCol.isEmpty) Seq(col(tsCol)) else Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    // one projection, not one withColumn per lag — a single analyzer pass
    // and the same single Window node
    values.select(col("*") +:
      lags.map(k => lag(col(valueCol), k).over(w).as(s"lag_$k")): _*)
  }

  /** Per-series difference and rate of change: value − previous value,
    * divided by elapsed seconds. First row of each series is null. */
  def deltaRate(
      values: DataFrame,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val elapsedUs = unix_micros(col(tsCol)) - unix_micros(col("_pt"))
    values
      .withColumn("_pv", lag(col(valueCol), 1).over(w))
      .withColumn("_pt", lag(col(tsCol), 1).over(w))
      .withColumn("delta", col(valueCol) - col("_pv"))
      // zero elapsed (duplicate timestamps) → null rate, not an ANSI
      // divide-by-zero abort
      .withColumn("rate_per_sec",
        when(elapsedUs === 0, lit(null))
          .otherwise(col("delta") / (elapsedUs / lit(1000000.0))))
      .select(col(keyCol), col(tsCol), col(valueCol), col("delta"), col("rate_per_sec"))
  }

  /** Ordered funnel analysis: for `steps` = (S1, ..., Sk), each key's
    * earliest time of S1, the earliest S2 STRICTLY AFTER that, the
    * earliest S3 after that, and so on — the product-analytics
    * conversion primitive ("viewed, then clicked, then purchased"),
    * greedy-earliest semantics (the standard funnel definition: taking
    * the earliest feasible time at each step maximizes the number of
    * completed steps). Emits one row per key appearing in the input:
    * `t_1..t_k` (null once the chain breaks) and `steps_completed`.
    *
    * Scale shape: step i is one filtered aggregate joined back on the
    * key — k−1 key-keyed hash joins over aggregates that shrink to
    * one row per surviving key; the event stream is scanned per step
    * but never self-joined row-to-row (an event×event formulation
    * would be quadratic in events per key). */
  def funnel(events: DataFrame, steps: Seq[String],
      keyCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(col(keyCol)).distinct()
    var acc = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as("t_1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t_$i"
      val cur = s"t_${i + 1}"
      val next = events.filter(col(typeCol) === step)
        .select(col(keyCol), col(tsCol).as("__ts"))
        .join(acc.select(col(keyCol), col(prev)), keyCol)
        .filter(col("__ts") > col(prev))
        .groupBy(col(keyCol)).agg(min(col("__ts")).as(cur))
      acc = acc.join(next, Seq(keyCol), "left")
    }
    val stepsCompleted = steps.indices
      .map(i => when(col(s"t_${i + 1}").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    base.join(acc, Seq(keyCol), "left")
      .withColumn("steps_completed", stepsCompleted.cast("int"))
  }

  /** Weekly cohort retention: users cohort by the week of their first
    * activity; each (cohort_week, week_offset) cell counts the cohort
    * members active `week_offset` weeks later, with the rate against
    * cohort size — the second product-analytics primitive next to
    * [[funnel]] (funnels measure depth, cohorts measure persistence).
    *
    * Scale shape: everything collapses to the DISTINCT (key, week)
    * activity frame first — one exchange on the key for the cohort
    * argmin, one on (cohort, offset) for the cells; the raw event
    * stream is aggregated away before any join. Offsets above
    * `maxWeeks` are dropped (a release report reads a bounded matrix). */
  def cohortRetention(events: DataFrame, maxWeeks: Int = 3,
      keyCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    require(maxWeeks >= 0, "maxWeeks must be >= 0")
    val weeks = events
      .select(col(keyCol), date_trunc("week", col(tsCol)).as("__w"))
      .distinct()
    // cohort assignment as a whole-partition window min (ONE key
    // exchange feeding every active week), and cohort_size read off
    // the matrix itself: every user is active in their own cohort week
    // by construction, so the offset-0 cell's n_active IS the cohort
    // size — no cohort groupBy, no sizes aggregate, no join-backs (the
    // r14 rework; the old two-groupBy + two-join plan computed
    // bit-identical values over four exchanges, 1.5× the wall). The
    // final window runs over the O(cohorts × offsets) matrix, not the
    // data.
    val cells = weeks
      .withColumn("cohort_week",
        min(col("__w")).over(Window.partitionBy(col(keyCol))))
      .withColumn("week_offset",
        (datediff(col("__w"), col("cohort_week")) / 7).cast("int"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active")))
          .over(Window.partitionBy(col("cohort_week"))))
      .withColumn("retention",
        round(col("n_active").cast("double") / col("cohort_size"), 4))
  }

  /** The aggregation-only OHLC formulation: open/close via the
    * flat-buffer [[graft.functions.ArgExtremum]] argmin/argmax over
    * the (ts, id) key — no windows, so it composes with Structured
    * Streaming's incremental aggregation (state per open bucket = the
    * running extremes plus a count). The earlier `min_by`/`max_by` on
    * a (ts, id) STRUCT carried a struct ordering buffer, which is not
    * hash-aggregable — every micro-batch paid a SortAggregate; the
    * flat buffer hash-aggregates on both the batch and streaming
    * paths. Same values as [[downsampleOhlc]]'s window formulation
    * because (ts, id) totally orders each bucket. Use this under
    * `groupBy(window(...))` with a watermark; the window form for
    * batch (where the stacked-windows single exchange wins). */
  def ohlcAggCols(tsCol: String = "ts", valueCol: String = "value",
      idCol: String = "event_id"): Seq[Column] = Seq(
    graft.functions.ArgExtremum.minBy(col(valueCol), col(tsCol), col(idCol)).as("open"),
    max(col(valueCol)).as("high"),
    min(col(valueCol)).as("low"),
    graft.functions.ArgExtremum.maxBy(col(valueCol), col(tsCol), col(idCol)).as("close"),
    count(lit(1)).as("n_points"))

  /** OHLC downsampling: per (key, time bucket) the open (first value),
    * high, low, close (last value) and point count — the standard
    * decimation that turns a raw tick/metric stream into
    * chart-or-feature-ready bars at a coarser grain, keeping the
    * extremes a plain per-bucket average would erase.
    *
    * Open/close ties on the timestamp break by `idCol` — a total order,
    * so bars are deterministic and engine-portable. Scale shape: both
    * row_number windows AND the bar aggregate share the (key, bucket)
    * clustering, so the whole operator runs on ONE exchange (the
    * stacked-windows discipline of the change-collapse reads); bars
    * per series per bucket are O(1) outputs of a corpus-sized input.
    *
    * `bucket` is any `date_trunc` unit (hour, day, week...). */
  def downsampleOhlc(
      values: DataFrame,
      keyCol: String = "series_id", tsCol: String = "ts",
      valueCol: String = "value", idCol: String = "event_id",
      bucket: String = "hour"): DataFrame = {
    val b = date_trunc(bucket, col(tsCol))
    def w(descending: Boolean) = {
      val base = Window.partitionBy(col(keyCol), col("__bucket"))
      if (descending) base.orderBy(col(tsCol).desc, col(idCol).desc)
      else base.orderBy(col(tsCol).asc, col(idCol).asc)
    }
    values
      .withColumn("__bucket", b)
      .withColumn("__rn_first", row_number().over(w(descending = false)))
      .withColumn("__rn_last", row_number().over(w(descending = true)))
      .groupBy(col(keyCol), col("__bucket").as("bucket"))
      .agg(
        min(when(col("__rn_first") === 1, col(valueCol))).as("open"),
        max(col(valueCol)).as("high"),
        min(col(valueCol)).as("low"),
        min(when(col("__rn_last") === 1, col(valueCol))).as("close"),
        count(lit(1)).as("n_points"))
  }

  /** Per-key ordinary-least-squares trend over (time, value): slope per
    * day, intercept at `originTs`, and n — the "is this series drifting
    * and how fast" summary every fleet of 100 TB metric streams wants
    * as a single aggregate pass.
    *
    * One partial+final hash aggregate keyed by the series: the five OLS
    * moments (n, Σx, Σy, Σxy, Σx²) are plain sums, so the map side
    * combines and the shuffle carries one moment row per key per
    * mapper — the cheapest possible shape, no window, no sort.
    *
    * Portability discipline: x = SECONDS since `originTs` (exact LONG),
    * y cast to DECIMAL(18,6) — all five moments are then EXACT decimal
    * sums, immune to accumulation order. Only the final closed-form
    * division runs in DOUBLE (slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²), a
    * true-double quantity whose half-way rounding cases are
    * measure-zero — ADVICE.md class A). The built-in `regr_slope` would
    * accumulate doubles in partition order and hash-diverge across
    * engines; this formulation is bit-portable. Slope is reported per
    * DAY (per-second slopes of daily-scale series vanish into the
    * rounding).
    *
    * Keys with n < 2 or zero x-variance (all points at one instant)
    * yield null slope/intercept.
    */
  def trend(events: DataFrame, originTs: java.sql.Timestamp,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    val x = (unix_micros(col(tsCol)) - lit(originTs.getTime * 1000L)) / lit(1000000L)
    val xd = col("__x").cast("decimal(19,0)")
    val moments = events
      .select(col(keyCol),
        x.cast("long").as("__x"),
        col(valueCol).cast("decimal(18,6)").as("__y"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,0)")).as("sx"),
        sum(col("__y")).as("sy"),
        sum((xd * col("__y")).cast("decimal(38,6)")).as("sxy"),
        sum((xd * xd).cast("decimal(38,0)")).as("sxx"))
    val det = col("n").cast("double") * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val slopeSec = (col("n").cast("double") * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) / det
    moments
      .withColumn("__slope_sec", when(col("n") > 1 && det =!= 0.0, slopeSec))
      .select(col(keyCol), col("n"),
        round(col("__slope_sec") * 86400.0, 8).as("slope_per_day"),
        round((col("sy").cast("double") - col("__slope_sec") * col("sx").cast("double"))
          / col("n").cast("double"), 8).as("intercept"))
  }

  /** CUSUM drift detection per key: cumulative sum of deviations from
    * the key's own mean, walked in time order — the classic
    * change-point statistic (a sustained level shift integrates into a
    * monotone ramp; noise cancels). Emits per row the running CUSUM and
    * a `drifted` flag once |S_i| exceeds `threshold`; the per-key
    * summary (max |S|, first crossing ts) is one groupBy away.
    *
    * Determinism: the key mean is an exact decimal mean rounded to 6dp,
    * deviations are exact DECIMAL(28,6) differences against it, and the
    * running sum is an exact decimal window sum — the entire statistic
    * is accumulation-order-immune, so it hash-matches across engines
    * (the movingStats discipline, applied to an unbounded frame).
    *
    * Scale shape (r14): ONE key exchange carries EVERYTHING — the mean
    * rides as a whole-partition window aggregate (exact decimal sum /
    * count, the same 6dp formula) stacked under the ordered cumulative
    * window on the same partitioning. The previous mean-groupBy +
    * join-back paid a second evaluation of the input scan and shuffle
    * for bit-identical values (verified at two SFs; 2× the wall in an
    * interleaved A/B). Ties on ts break by `idCol` for a total order.
    */
  def cusum(events: DataFrame, threshold: Double,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", idCol: String = "event_id"): DataFrame = {
    // Mean via exact decimal sum → ONE double division → 6dp round (the
    // movingStats oracle discipline; decimal-by-count division semantics
    // differ across engines, double division does not).
    val wk = Window.partitionBy(col(keyCol))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__mean",
        round(sum(col(valueCol).cast("decimal(18,6)")).over(wk).cast("double")
          / count(lit(1)).over(wk), 6).cast("decimal(18,6)"))
      .withColumn("__dev",
        (col(valueCol).cast("decimal(18,6)") - col("__mean")).cast("decimal(28,6)"))
      .withColumn("cusum", sum(col("__dev")).over(w).cast("decimal(38,6)"))
      .withColumn("drifted", abs(col("cusum")) > lit(threshold))
      .select(col(keyCol), col(tsCol), col(idCol), col(valueCol),
        col("cusum").cast("double").as("cusum"), col("drifted"))
  }

  /** Holt double-exponential smoothing per series: the final
    * (level, trend) state and one-step forecast of the linear-trend
    * exponential-smoothing fold over each key's (ts, id)-ordered
    * values — the classic streaming-friendly trend tracker
    * (level' = α·x + (1−α)(level+trend); Holt 1957).
    *
    * A recursive fold has no window form (each step feeds the next),
    * so SQL engines spell it as a per-step recursive CTE; here it is
    * ONE key-keyed exchange (sort_array over (ts, id, value) structs
    * inside the aggregate — no window, so no second sort) and then a
    * compiled [[graft.functions.HoltLinear]] kernel per series. Series
    * are independent: the shape is embarrassingly parallel at any key
    * cardinality, with per-series memory bounded by series length —
    * the same bound a recursive CTE's working table pays, minus the
    * per-step join. Null values are skipped (≡ pre-filtering).
    *
    * Use dyadic α/β (0.5, 0.25, …) when an external system must
    * reproduce the doubles bit-exactly — see the kernel scaladoc. */
  def holtLinear(events: DataFrame, alpha: Double, beta: Double,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", idCol: String = "event_id"): DataFrame =
    events
      // null-ts rows out BEFORE grouping (the lttb pattern): sort_array
      // places null-ts structs FIRST while the oracle's ORDER BY ts is
      // NULLS LAST, so keeping them would silently break the fold-order
      // bit-equality claim on corpora with null timestamps
      .filter(col(tsCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(
        struct(col(tsCol).as("t"), col(idCol).as("i"),
          col(valueCol).cast("double").as("v")))).as("__o"))
      .select(col(keyCol),
        graft.functions.HoltLinear(
          expr("transform(__o, e -> e.v)"), alpha, beta).as("__h"))
      .select(col(keyCol),
        col("__h.level").as("level"), col("__h.trend").as("trend"),
        col("__h.forecast").as("forecast"))

  /** LTTB display-grade downsampling per series: keep `k` points that
    * preserve each key's visual shape (Steinarsson 2013 — the
    * largest-triangle-three-buckets selection every dashboarding
    * time-series engine ships). Like [[holtLinear]], the selection is
    * a left-to-right greedy recursion (each bucket's pick depends on
    * the previous pick), so it has no window form; the plan is ONE
    * key-keyed exchange (sort_array inside the aggregate) and a
    * compiled [[graft.functions.LttbSelect]] pass per series, then an
    * explode back to rows. Values quantize to 6dp micro-units (the
    * cusum decimal discipline) so the triangle geometry runs on
    * exact-integer-valued doubles — bit-reproducible on any engine
    * replaying the same formulas. Series with ≤ k points pass through
    * unchanged. Rows with null ts or null value are FILTERED before
    * the selection (a null would otherwise read as a fabricated point
    * at 0 — holtLinear's null-skip semantics, applied at row level).
    *
    * Output: (key, ts_us, id, value) — the selected points, value at
    * 6dp; ts as epoch µs (the portable cross-engine form). */
  def lttb(events: DataFrame, k: Int,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value", idCol: String = "event_id"): DataFrame =
    events
      .filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .select(col(keyCol),
        unix_micros(col(tsCol)).as("__x"), col(idCol).as("__i"),
        // try_cast, not cast: |value| >= 1e12 overflows decimal(18,6) —
        // under ANSI a plain cast aborts the job, under non-ANSI it
        // nulls AFTER the explicit null filter above and the kernel's
        // getLong would read that null struct field as a fabricated
        // point at y=0. try_cast nulls in BOTH modes, and the filter
        // below drops it — the documented null-skip semantics extended
        // to overflow. (The multiply and long cast cannot overflow once
        // the decimal cast succeeded: |v·1e6| < 1e18 < 2^63.)
        (col(valueCol).try_cast("decimal(18,6)") * 1000000L).cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__x"), col("__i"), col("__y"))))
        .as("__pts"))
      .select(col(keyCol),
        explode(graft.functions.LttbSelect(col("__pts"), k)).as("__p"))
      .select(col(keyCol), col("__p.__x").as("ts_us"), col("__p.__i").as(idCol),
        (col("__p.__y").cast("double") / 1000000.0).as("value"))

  /** Per-key gap report: every pair of consecutive events further
    * apart than `minGapSec` — the data-completeness audit a feed SLA
    * runs (a resample would FILL these; first you have to find them).
    * One key-keyed exchange (the lag window); gap arithmetic is exact
    * µs integer subtraction.
    *
    * Output: (key, gap_start, gap_end, gap_sec) per detected gap. */
  def gapReport(events: DataFrame, minGapSec: Long,
      keyCol: String = "user_id", tsCol: String = "ts",
      idCol: String = "event_id"): DataFrame = {
    require(minGapSec >= 1, "minGapSec must be >= 1")
    // id tiebreak: equal timestamps would otherwise make lag()
    // partition-order-dependent
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    events.select(col(keyCol), col(tsCol), col(idCol))
      .withColumn("__prev", lag(col(tsCol), 1).over(w))
      .filter(col("__prev").isNotNull)
      .withColumn("gap_sec",
        (unix_micros(col(tsCol)) - unix_micros(col("__prev"))).cast("double") / 1e6)
      .filter(col("gap_sec") >= minGapSec.toDouble)
      .select(col(keyCol), col("__prev").as("gap_start"),
        col(tsCol).as("gap_end"), col("gap_sec"))
  }

  /** Robust per-key outlier flags: median / MAD (median absolute
    * deviation) instead of mean / stddev, so the baseline itself is
    * immune to the outliers it is hunting — the z-score's failure mode
    * on heavy-tailed feeds. Exact medians (`percentile`, the
    * rel_percentile discipline; swap in `approx_percentile` per the
    * keepTopQuantileApprox pattern for strata beyond one executor's
    * sort budget). Both stats are 6dp-rounded BEFORE anything compares
    * against them, so the flag's inputs are cross-engine-identical
    * doubles; the flag compares against `nMads · 1.4826 · MAD` (the
    * normal-consistency constant) in shared IEEE arithmetic.
    *
    * Plan shape (r14): both percentiles ride as whole-partition WINDOW
    * aggregates over ONE key exchange — two stacked Window nodes on
    * the same partitioning (the second consumes the first's median).
    * The previous two-groupBy + two-join formulation paid four
    * exchanges for bit-identical values (value-equality verified at
    * two SFs; 3× the wall in an interleaved A/B). Each window
    * partition is one key's rows — the same per-key memory bound the
    * exact-percentile aggregate already implied.
    *
    * Output: every input row + (med, mad, is_outlier). */
  def madOutliers(events: DataFrame, nMads: Double = 5.0,
      keyCol: String = "user_id", tsCol: String = "ts",
      valueCol: String = "value"): DataFrame = {
    require(nMads > 0.0, "nMads must be positive")
    val w = Window.partitionBy(col(keyCol))
    events
      .withColumn("med", round(percentile(col(valueCol), lit(0.5)).over(w), 6))
      .withColumn("mad",
        round(percentile(abs(col(valueCol) - col("med")), lit(0.5)).over(w), 6))
      .withColumn("is_outlier",
        abs(col(valueCol) - col("med")) > lit(nMads) * lit(1.4826) * col("mad"))
      .select(col(keyCol), col(tsCol), col(valueCol),
        col("med"), col("mad"), col("is_outlier"))
  }
}
