package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeriesOps

/** As-of join, gap-fill resample, and delta/rate semantics on
  * handcrafted series. */
class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin: latest right row at-or-before each left row, per key") {
    val left = Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 100L), // equal-ts right row exists
      (1L, ts("2024-01-01T11:30:00Z"), 101L),
      (1L, ts("2024-01-01T09:00:00Z"), 102L), // before any right row
      (2L, ts("2024-01-01T10:00:00Z"), 103L)) // other key: no right rows
      .toDF("series_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 5.0),
      (1L, ts("2024-01-01T11:00:00Z"), 7.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.asOfJoin(left, right).orderBy("event_id")
      .select("event_id", "asof_value").collect()
    assert(got(0).getDouble(1) == 5.0) // inclusive at equal ts
    assert(got(1).getDouble(1) == 7.0)
    assert(got(2).isNullAt(1)) // nothing before
    assert(got(3).isNullAt(1)) // key never quoted
  }

  test("asOfJoin forward/nearest: inclusive bounds, distance pick, ties to backward") {
    val left = Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 100L), // equal-ts right row exists
      (1L, ts("2024-01-01T10:40:00Z"), 101L), // 11:00 (20m ahead) beats 10:00 (40m back)
      (1L, ts("2024-01-01T10:30:00Z"), 102L), // exact midpoint: tie → backward
      (1L, ts("2024-01-01T12:00:00Z"), 103L), // after all right rows
      (1L, ts("2024-01-01T09:00:00Z"), 104L)) // before all right rows
      .toDF("series_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 5.0),
      (1L, ts("2024-01-01T11:00:00Z"), 7.0))
      .toDF("series_id", "ts", "value")
    def run(dir: String): Map[Long, Option[Double]] =
      TimeSeriesOps.asOfJoin(left, right, direction = dir)
        .select("event_id", "asof_value").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val fwd = run("forward")
    assert(fwd(100L).contains(5.0)) // inclusive at equal ts
    assert(fwd(101L).contains(7.0))
    assert(fwd(103L).isEmpty)       // nothing after
    assert(fwd(104L).contains(5.0))
    val near = run("nearest")
    assert(near(100L).contains(5.0))
    assert(near(101L).contains(7.0)) // forward closer
    assert(near(102L).contains(5.0)) // tie → backward
    assert(near(103L).contains(7.0)) // only backward exists
    assert(near(104L).contains(5.0)) // only forward exists
  }

  test("intervalUnionLength: overlaps merge, touching intervals merge, gaps split") {
    val iv = Seq(
      // key 1: [0,10) ∪ [5,20) ∪ [20,25) = one 25-min segment (touching
      // endpoints merge: half-open [a,b) ∪ [b,c) is contiguous),
      // then [40,45) after a gap
      (1L, ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:10:00Z")),
      (1L, ts("2024-01-01T00:05:00Z"), ts("2024-01-01T00:20:00Z")),
      (1L, ts("2024-01-01T00:20:00Z"), ts("2024-01-01T00:25:00Z")),
      (1L, ts("2024-01-01T00:40:00Z"), ts("2024-01-01T00:45:00Z")),
      // key 1: contained interval adds nothing
      (1L, ts("2024-01-01T00:41:00Z"), ts("2024-01-01T00:43:00Z")),
      // key 2: zero-length dropped entirely
      (2L, ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:00:00Z")))
      .toDF("series_id", "start_ts", "end_ts")
    val got = TimeSeriesOps.intervalUnionLength(iv)
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, us) => k -> ((n, us / 60000000L)) }.toMap
    assert(got(1L) == ((2L, 30L))) // 25 min + 5 min over 2 segments
    assert(!got.contains(2L))
  }

  test("resampleFill: bucket winners + forward fill, leading gaps stay null") {
    val pts = Seq(
      (1L, ts("2024-01-01T01:10:00Z"), 1.0),
      (1L, ts("2024-01-01T01:50:00Z"), 2.0), // same bucket, later ts wins
      (1L, ts("2024-01-01T03:05:00Z"), 9.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.resampleFill(pts, 3600,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T05:00:00Z"))
      .orderBy("bucket").collect()
    assert(got.length == 5)
    assert(got(0).isNullAt(2) && got(0).isNullAt(3)) // 00h: before first point
    assert(got(1).getDouble(3) == 2.0)               // 01h: later-point wins
    assert(got(2).isNullAt(2) && got(2).getDouble(3) == 2.0) // 02h: filled
    assert(got(3).getDouble(3) == 9.0)
    assert(got(4).isNullAt(2) && got(4).getDouble(3) == 9.0)
  }

  test("asOfJoin: a right row with a NULL value still matches (not skipped)") {
    val left = Seq((1L, ts("2024-01-01T02:00:00Z"), 1L)).toDF("series_id", "ts", "event_id")
    val right = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), Option(5.0)),
      (1L, ts("2024-01-01T01:00:00Z"), Option.empty[Double])) // latest: null value
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.asOfJoin(left, right).collect()
    assert(got.length == 1 && got(0).isNullAt(3)) // null carried, 5.0 NOT resurrected
  }

  test("resampleFill: partial trailing bucket is generated; empty span yields no grid") {
    val pts = Seq((1L, ts("2024-01-01T05:10:00Z"), 3.0)).toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.resampleFill(pts, 3600,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T05:30:00Z"))
    assert(got.count() == 6) // 00..05, incl. the partial [05:00, 05:30) bucket
    assert(got.filter(col("bucket") === ts("2024-01-01T05:00:00Z"))
      .head().getDouble(2) == 3.0)
    val empty = TimeSeriesOps.resampleFill(pts, 3600,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T00:00:00Z"))
    assert(empty.count() == 0)
  }

  test("resampleFill: a bucket whose latest reading is null stays null (no stale resurrection)") {
    val pts = Seq(
      (1L, ts("2024-01-01T00:10:00Z"), Option(5.0)),
      (1L, ts("2024-01-01T01:10:00Z"), Option.empty[Double]))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.resampleFill(pts, 3600,
      ts("2024-01-01T00:00:00Z"), ts("2024-01-01T03:00:00Z"))
      .orderBy("bucket").collect()
    assert(got(0).getDouble(3) == 5.0)
    assert(got(1).isNullAt(3)) // real null reading, NOT 5.0 resurrected
    assert(got(2).isNullAt(3)) // forward fill carries the null state
  }

  test("deltaRate: duplicate timestamps give null rate, not a divide-by-zero abort") {
    val pts = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 1.0),
      (1L, ts("2024-01-01T00:00:00Z"), 2.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.deltaRate(pts).orderBy("value").collect()
    assert(got.forall(r => r.isNullAt(4) || !r.isNullAt(4))) // executes without throwing
    assert(got.exists(r => !r.isNullAt(3) && r.isNullAt(4))) // delta set, rate null
  }

  test("deltaRate: per-series difference and per-second rate; first row null") {
    val pts = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 10.0),
      (1L, ts("2024-01-01T00:00:30Z"), 25.0),
      (2L, ts("2024-01-01T00:00:00Z"), 1.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.deltaRate(pts).orderBy("series_id", "ts").collect()
    assert(got(0).isNullAt(3) && got(0).isNullAt(4))
    assert(got(1).getDouble(3) == 15.0 && got(1).getDouble(4) == 0.5)
    assert(got(2).isNullAt(3)) // new series restarts
  }

  test("movingStats: trailing window avg/std/zscore with known values") {
    val pts = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 2.0),
      (1L, ts("2024-01-01T00:01:00Z"), 4.0),
      (1L, ts("2024-01-01T00:02:00Z"), 6.0),
      (1L, ts("2024-01-01T00:03:00Z"), 100.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.movingStats(pts, windowRows = 3)
      .orderBy("ts").collect()
    // row 0: n=1 → avg=value, std undefined-ish (n>1 guard) → null z
    assert(got(0).getDouble(3) == 2.0 && got(0).isNullAt(5))
    // row 2: window {2,4,6}: avg 4, var ((4+16+36)-144/3)/2 = 4, std 2, z=1
    assert(got(2).getDouble(3) == 4.0)
    assert(got(2).getDouble(4) == 2.0)
    assert(got(2).getDouble(5) == 1.0)
    // row 3: window {4,6,100} — spike scores high
    assert(got(3).getDouble(5) > 1.0)
  }

  test("movingStats: zero-variance window yields null zscore, not a div0") {
    val pts = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 5.0),
      (1L, ts("2024-01-01T00:01:00Z"), 5.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.movingStats(pts, windowRows = 2).orderBy("ts").collect()
    assert(got(1).getDouble(4) == 0.0 && got(1).isNullAt(5))
  }

  test("sessionize: gap splits, per-key independence, 1-based numbering") {
    val ev = Seq(
      (1L, ts("2024-01-01T00:00:00Z")),
      (1L, ts("2024-01-01T00:10:00Z")), // same session (gap 10m)
      (1L, ts("2024-01-01T01:00:00Z")), // gap 50m > 30m → new session
      (2L, ts("2024-01-01T05:00:00Z"))) // other key starts at 1
      .toDF("user_id", "ts")
    val got = TimeSeriesOps.sessionize(ev, gapSec = 1800)
      .orderBy("user_id", "ts").select("user_id", "session_no")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("seasonalResiduals: per-hour baseline and residual") {
    val pts = Seq(
      (1L, ts("2024-01-01T05:00:00Z"), 10.0),
      (1L, ts("2024-01-02T05:30:00Z"), 20.0), // same hour slot, next day
      (1L, ts("2024-01-01T06:00:00Z"), 7.0))
      .toDF("series_id", "ts", "value")
    val got = TimeSeriesOps.seasonalResiduals(pts).orderBy("ts")
      .select("seasonal_mean", "residual").as[(Double, Double)].collect()
    assert(got(0) == ((15.0, -5.0))) // hour-5 mean 15
    assert(got(2) == ((15.0, 5.0)))
    assert(got(1) == ((7.0, 0.0))) // hour-6 singleton
  }

  test("seasonalResiduals: signed zero normalized bit-exactly; null ts row kept") {
    // mean of {0.1, 0.3, 0.5} in double is 0.30000000000000004, so the
    // 0.3 row's raw residual is a tiny NEGATIVE that rounds to -0.0
    // without the + 0.0 normalization. IEEE == can't see the sign —
    // compare raw bits.
    val pts = Seq(
      (1L, ts("2024-01-01T05:10:00Z"), 0.1),
      (1L, ts("2024-01-01T05:20:00Z"), 0.3),
      (1L, ts("2024-01-01T05:30:00Z"), 0.5))
      .toDF("series_id", "ts", "value")
    val r = TimeSeriesOps.seasonalResiduals(pts)
      .filter(col("value") === 0.3).select("residual").as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(r)
      == java.lang.Double.doubleToRawLongBits(0.0), s"residual bits of $r")
    // null-ts row survives with a null baseline instead of vanishing
    val withNull = pts.unionByName(
      Seq((1L, null.asInstanceOf[java.sql.Timestamp], 9.0)).toDF("series_id", "ts", "value"))
    val out = TimeSeriesOps.seasonalResiduals(withNull)
    assert(out.count() == 4)
    assert(out.filter(col("ts").isNull).select("residual").head().isNullAt(0))
  }

  test("movingStats: zscore signed zero normalized bit-exactly") {
    // window {0.1, 0.5, 0.3}: ma = 0.30000000000000004 → value − ma is a
    // tiny negative → round gives -0.0 without the + 0.0 normalization
    val pts = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 0.1),
      (1L, ts("2024-01-01T00:01:00Z"), 0.5),
      (1L, ts("2024-01-01T00:02:00Z"), 0.3))
      .toDF("series_id", "ts", "value")
    val z = TimeSeriesOps.movingStats(pts, windowRows = 3)
      .filter(col("value") === 0.3).select("zscore").as[Double].head()
    assert(java.lang.Double.doubleToRawLongBits(z)
      == java.lang.Double.doubleToRawLongBits(0.0), s"zscore bits of $z")
  }

  test("lagFeatures: per-key offsets in one Window node") {
    val pts = Seq(
      (1L, ts("2024-01-01T00:00:00Z"), 1.0),
      (1L, ts("2024-01-01T01:00:00Z"), 2.0),
      (1L, ts("2024-01-01T02:00:00Z"), 3.0),
      (2L, ts("2024-01-01T00:00:00Z"), 9.0))
      .toDF("series_id", "ts", "value")
    val f = TimeSeriesOps.lagFeatures(pts, lags = Seq(1, 2))
    val got = f.orderBy("series_id", "ts")
      .select("value", "lag_1", "lag_2").collect()
    assert(got(2).getDouble(1) == 2.0 && got(2).getDouble(2) == 1.0)
    assert(got(3).isNullAt(1)) // other key restarts
    val windows = "\\bWindow\\b".r.findAllIn(f.queryExecution.executedPlan.toString).length
    assert(windows == 1, "all lags must share one Window node")
  }

  test("sessionize: gap exactly equal to gapSec stays in the session") {
    val ev = Seq(
      (1L, ts("2024-01-01T00:00:00Z")),
      (1L, ts("2024-01-01T00:30:00Z")))
      .toDF("user_id", "ts")
    val got = TimeSeriesOps.sessionize(ev, gapSec = 1800)
      .select(max("session_no")).as[Long].head()
    assert(got == 1L)
  }

  test("funnel: greedy-earliest step chain, order enforced strictly") {
    val ev = Seq(
      // user 1: full funnel in order
      (1L, ts("2024-01-01T00:00:00Z"), "view"),
      (1L, ts("2024-01-01T01:00:00Z"), "click"),
      (1L, ts("2024-01-01T02:00:00Z"), "purchase"),
      // user 2: purchase BEFORE click — chain breaks at step 3
      (2L, ts("2024-01-01T00:00:00Z"), "view"),
      (2L, ts("2024-01-01T00:30:00Z"), "purchase"),
      (2L, ts("2024-01-01T01:00:00Z"), "click"),
      // user 3: never viewed — 0 steps even though they clicked
      (3L, ts("2024-01-01T00:00:00Z"), "click"),
      // user 4: second view is irrelevant; click after FIRST view counts
      (4L, ts("2024-01-01T00:00:00Z"), "view"),
      (4L, ts("2024-01-01T00:10:00Z"), "click"),
      (4L, ts("2024-01-01T05:00:00Z"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = TimeSeriesOps.funnel(ev, Seq("view", "click", "purchase"))
      .orderBy("user_id")
      .select("user_id", "steps_completed").as[(Long, Int)].collect().toSeq
    assert(got == Seq((1L, 3), (2L, 2), (3L, 0), (4L, 2)))
    // simultaneous events do NOT satisfy the strict order
    val tied = Seq(
      (9L, ts("2024-01-01T00:00:00Z"), "view"),
      (9L, ts("2024-01-01T00:00:00Z"), "click"))
      .toDF("user_id", "ts", "event_type")
    val tiedGot = TimeSeriesOps.funnel(tied, Seq("view", "click"))
      .select("steps_completed").as[Int].head()
    assert(tiedGot == 1)
  }

  test("cohortRetention: first-activity cohorts, offset cells, bounded matrix") {
    val ev = Seq(
      // cohort week of Jan 1 (Monday): users 1, 2
      (1L, ts("2024-01-02T00:00:00Z")),
      (2L, ts("2024-01-03T00:00:00Z")),
      // user 1 returns in week +1 and +2; user 2 never returns
      (1L, ts("2024-01-09T00:00:00Z")),
      (1L, ts("2024-01-16T00:00:00Z")),
      // cohort week of Jan 8: user 3 (first seen then, returns week +5 — dropped)
      (3L, ts("2024-01-10T00:00:00Z")),
      (3L, ts("2024-02-14T00:00:00Z")))
      .toDF("user_id", "ts")
    val got = TimeSeriesOps.cohortRetention(ev, maxWeeks = 3)
      .orderBy("cohort_week", "week_offset")
      .select("week_offset", "n_active", "cohort_size", "retention")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0, 2L, 2L, 1.0),  // Jan-1 cohort: both active in week 0
      (1, 1L, 2L, 0.5),  // only user 1 returns
      (2, 1L, 2L, 0.5),
      (0, 1L, 1L, 1.0))) // Jan-8 cohort: week-5 return is outside the matrix
  }

  test("downsampleOhlc: bars keep open/close by time order, extremes, count") {
    val pts = Seq(
      (1L, ts("2024-01-01T01:00:00Z"), 5.0, 10L),
      (1L, ts("2024-01-01T02:00:00Z"), 9.0, 11L),
      (1L, ts("2024-01-01T03:00:00Z"), 1.0, 12L),
      (1L, ts("2024-01-01T04:00:00Z"), 7.0, 13L),
      (1L, ts("2024-01-02T00:30:00Z"), 2.0, 14L),
      (2L, ts("2024-01-01T12:00:00Z"), 3.0, 15L))
      .toDF("series_id", "ts", "value", "event_id")
    val d = TimeSeriesOps.downsampleOhlc(pts, bucket = "day")
    val got = d.orderBy("series_id", "bucket")
      .select("series_id", "open", "high", "low", "close", "n_points")
      .as[(Long, Double, Double, Double, Double, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5.0, 9.0, 1.0, 7.0, 4L), // day 1: opens 5, closes 7, hi 9, lo 1
      (1L, 2.0, 2.0, 2.0, 2.0, 1L), // day 2: singleton bar
      (2L, 3.0, 3.0, 3.0, 3.0, 1L)))
    // same-timestamp ties: event_id decides open and close
    val tied = Seq(
      (1L, ts("2024-01-01T01:00:00Z"), 8.0, 2L),
      (1L, ts("2024-01-01T01:00:00Z"), 4.0, 1L))
      .toDF("series_id", "ts", "value", "event_id")
    val bar = TimeSeriesOps.downsampleOhlc(tied, bucket = "day")
      .select("open", "close").as[(Double, Double)].head()
    assert(bar == ((4.0, 8.0)))
    // one exchange carries both windows and the bar aggregate
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(d.queryExecution.executedPlan.toString).length
    assert(exchanges == 1, "stacked windows + bar agg must share one exchange")
    // the aggregation-only formulation (the streaming face) produces
    // the identical bars: (ts, id) totally orders each bucket
    val aggForm = pts.groupBy(col("series_id"), date_trunc("day", col("ts")).as("bucket"))
      .agg(TimeSeriesOps.ohlcAggCols().head, TimeSeriesOps.ohlcAggCols().tail: _*)
    val viaAgg = aggForm
      .orderBy("series_id", "bucket")
      .select("series_id", "open", "high", "low", "close", "n_points")
      .as[(Long, Double, Double, Double, Double, Long)].collect().toSeq
    assert(viaAgg == got)
    // the flat ArgExtremum buffer keeps the streaming face a pure
    // HashAggregate (min_by/max_by on a (ts, id) struct key planned
    // partial+final SortAggregate per micro-batch)
    val aggPlan = aggForm.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("SortAggregate"), aggPlan)
    // ArgExtremum ≡ min_by/max_by on randomized (ts, id, value) rows
    val rnd = new scala.util.Random(67)
    val fuzz = (0 until 400).map { i =>
      (rnd.nextInt(5).toLong, ts(f"2024-01-01T${rnd.nextInt(24)}%02d:0${rnd.nextInt(6)}:00Z"),
        rnd.nextDouble() * 100, i.toLong)
    }.toDF("series_id", "ts", "value", "event_id").repartition(7)
    val mine = fuzz.groupBy("series_id").agg(
      graft.functions.ArgExtremum.minBy(col("value"), col("ts"), col("event_id")).as("open"),
      graft.functions.ArgExtremum.maxBy(col("value"), col("ts"), col("event_id")).as("close"))
      .orderBy("series_id").collect().toSeq
    val builtin = fuzz.groupBy("series_id").agg(
      min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
      max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
      .orderBy("series_id").collect().toSeq
    assert(mine == builtin)
  }

  test("trend: recovers a constructed linear drift; degenerate keys go null") {
    val origin = ts("2024-01-01T00:00:00Z")
    // key 1: y = 10 + 2/day * t (points at 0h, 12h, 24h, 36h)
    val rows = Seq(0, 12, 24, 36).map { h =>
      (1L, ts(f"2024-01-0${1 + h / 24}T${h % 24}%02d:00:00Z"), 10.0 + 2.0 * h / 24.0)
    } ++ Seq(
      (2L, ts("2024-01-01T05:00:00Z"), 7.0), // n = 1
      (3L, ts("2024-01-01T05:00:00Z"), 1.0), // zero x-variance
      (3L, ts("2024-01-01T05:00:00Z"), 9.0))
    val out = TimeSeriesOps.trend(rows.toDF("user_id", "ts", "value"), origin)
      .orderBy("user_id")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out(0) == ((1L, 4L, Some(2.0), Some(10.0))))
    assert(out(1) == ((2L, 1L, None, None)))
    assert(out(2) == ((3L, 2L, None, None)))
  }

  test("trend: exact decimal moments are partition-order immune") {
    val origin = ts("2024-01-01T00:00:00Z")
    val r = new scala.util.Random(5)
    val rows = (1 to 4000).map { i =>
      (i % 7L, new java.sql.Timestamp(origin.getTime + i * 61000L),
        math.round(r.nextDouble() * 1e6) / 1e4)
    }
    val a = TimeSeriesOps.trend(rows.toDF("user_id", "ts", "value").repartition(1), origin)
      .orderBy("user_id").collect().toSeq
    val b = TimeSeriesOps.trend(rows.toDF("user_id", "ts", "value").repartition(13), origin)
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("cusum: a level shift integrates past the threshold; pre-shift rows stay quiet") {
    // 10 points at 0, then 10 points at 10: mean 5, deviations ±5, so
    // |S| ramps to 25 mid-series and returns to ~0 at the end.
    val rows = (0 until 20).map { i =>
      (1L, new java.sql.Timestamp(ts("2024-01-01T00:00:00Z").getTime + i * 60000L),
        i.toLong, if (i < 10) 0.0 else 10.0)
    }
    val out = TimeSeriesOps.cusum(
      rows.toDF("user_id", "ts", "event_id", "value"), threshold = 20.0)
      .orderBy("event_id")
      .as[(Long, java.sql.Timestamp, Long, Double, Double, Boolean)].collect().toSeq
    // running sum of -5s bottoms out at -50 after row 9, recovers +5/row
    assert(out(9)._5 == -50.0)
    assert(out.last._5 == 0.0)
    assert(!out(3)._6 && out(9)._6, "flag only past the threshold")
    // exactness: cusum of the final row is EXACTLY zero (decimal, not float)
    assert(out.count(_._6) == (0 until 20).count(i => {
      val s = (0 to i).map(j => if (j < 10) -5.0 else 5.0).sum
      math.abs(s) > 20.0
    }))
  }

  test("gapReport finds exactly the gaps past the threshold, id-tiebroken") {
    val ev = Seq(
      (1L, ts("2024-03-01T00:00:00Z"), 10L),
      (1L, ts("2024-03-01T01:00:00Z"), 11L),   // 1h gap — below
      (1L, ts("2024-03-01T07:00:00Z"), 12L),   // 6h gap — reported
      (1L, ts("2024-03-01T07:00:00Z"), 13L),   // 0s gap (equal ts)
      (2L, ts("2024-03-01T00:00:00Z"), 20L)    // single event: no pair
    ).toDF("user_id", "ts", "event_id")
    val got = TimeSeriesOps.gapReport(ev, minGapSec = 7200L)
      .select("user_id", "gap_sec").as[(Long, Double)].collect().toSeq
    assert(got == Seq((1L, 21600.0)))
  }

  test("madOutliers: robust baseline survives the outlier it flags") {
    // 9 values at ~100 and one wild point; mean/std would drag toward
    // the outlier — the median/MAD baseline must not
    val ev = ((1 to 9).map(i => (1L, ts(f"2024-03-01T00:0$i:00Z"), 100.0 + i)) :+
      (1L, ts("2024-03-01T00:10:00Z"), 10000.0)).toDF("user_id", "ts", "value")
    val got = TimeSeriesOps.madOutliers(ev, nMads = 5.0)
      .orderBy("value").select("value", "med", "mad", "is_outlier")
      .as[(Double, Double, Double, Boolean)].collect().toSeq
    val med = got.head._2
    assert(med >= 104 && med <= 106, s"median near the bulk, got $med")
    assert(got.count(_._4) == 1 && got.last._4, "exactly the wild point flags")
    // a constant series has MAD 0 and flags nothing
    val const = (1 to 5).map(i => (1L, ts(f"2024-03-01T00:0$i:00Z"), 7.0))
      .toDF("user_id", "ts", "value")
    assert(TimeSeriesOps.madOutliers(const).filter(col("is_outlier")).count() == 0)
  }

  test("holtLinear: hand-computed fold, order from (ts, id), null skipping") {
    // series 1, 2, 3 at alpha=0.5 beta=0.25:
    //   x=2: level 1.5,    trend 0.125
    //   x=3: level 2.3125, trend 0.296875  -> forecast 2.609375
    // rows arrive ts-shuffled and carry a mid-series null (skipped);
    // user 2 is a single point (level = x, trend 0); user 3 all-null.
    val rows = Seq(
      (1L, ts("2024-01-01T00:03:00Z"), 3L, Some(3.0)),
      (1L, ts("2024-01-01T00:01:00Z"), 1L, Some(1.0)),
      (1L, ts("2024-01-01T00:02:30Z"), 9L, None),
      (1L, ts("2024-01-01T00:02:00Z"), 2L, Some(2.0)),
      (2L, ts("2024-01-01T00:01:00Z"), 4L, Some(42.0)),
      (3L, ts("2024-01-01T00:01:00Z"), 5L, None))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("value", col("value").cast("double"))
    val got = TimeSeriesOps.holtLinear(rows, alpha = 0.5, beta = 0.25)
      .orderBy("user_id")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some(2.3125), Some(0.296875), Some(2.609375)),
      (2L, Some(42.0), Some(0.0), Some(42.0)),
      (3L, None, None, None)))
    // same-ts rows fall back to event_id order: [10 (id 1), 0 (id 2)]
    // folds to level 5, trend -1.25 — the reverse order would not
    val tie = Seq(
      (1L, ts("2024-01-01T00:01:00Z"), 2L, 0.0),
      (1L, ts("2024-01-01T00:01:00Z"), 1L, 10.0))
      .toDF("user_id", "ts", "event_id", "value")
    val t = TimeSeriesOps.holtLinear(tie, alpha = 0.5, beta = 0.25).head()
    assert(t.getDouble(1) == 5.0 && t.getDouble(2) == -1.25)
    // null-ts rows are filtered BEFORE grouping (the lttb pattern):
    // sort_array would otherwise place them FIRST while the oracle's
    // ORDER BY ts is NULLS LAST, silently breaking fold-order equality
    val withNullTs = rows.union(Seq(
      (1L, Option.empty[java.sql.Timestamp], 99L, Some(1e9)))
      .toDF("user_id", "ts", "event_id", "value"))
    val gotNullTs = TimeSeriesOps.holtLinear(withNullTs, alpha = 0.5, beta = 0.25)
      .orderBy("user_id")
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect().toSeq
    assert(gotNullTs == got, "null-ts rows must not enter the fold")
  }

  test("lttb: equals a reference implementation; n<=k passes through") {
    // reference LTTB on (x, y) long pairs — the published algorithm,
    // written independently of the kernel
    def ref(pts: IndexedSeq[(Long, Long, Long)], k: Int): IndexedSeq[(Long, Long, Long)] = {
      val n = pts.length
      if (n <= k) return pts
      val kk = k - 2; val m = n - 2
      val out = IndexedSeq.newBuilder[(Long, Long, Long)]
      out += pts.head
      var prev = pts.head
      for (b <- 0 until kk) {
        val lo = 1 + (b.toLong * m / kk).toInt
        val hi = 1 + ((b + 1).toLong * m / kk).toInt
        val (ax, ay) =
          if (b < kk - 1) {
            val nlo = 1 + ((b + 1).toLong * m / kk).toInt
            val nhi = 1 + ((b + 2).toLong * m / kk).toInt
            val nb = pts.slice(nlo, nhi)
            (nb.map(_._1).sum.toDouble / nb.size, nb.map(_._3).sum.toDouble / nb.size)
          } else (pts.last._1.toDouble, pts.last._3.toDouble)
        val cand = (lo until hi).maxBy { j =>
          val p = pts(j)
          (math.abs((prev._1 - ax) * (p._3 - prev._3)
            - (prev._1 - p._1) * (ay - prev._3)), -j) // strict-max, earliest wins
        }
        prev = pts(cand)
        out += prev
      }
      out += pts.last
      out.result()
    }
    val rnd = new scala.util.Random(7)
    val series = (0 until 137).map { i =>
      (1L, new java.sql.Timestamp(1704067200000L + i * 60000L + rnd.nextInt(500)),
        (i + 10).toLong, math.round(rnd.nextGaussian() * 1e6) / 1e3)
    }
    val df = rnd.shuffle(series).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeriesOps.lttb(df, k = 12)
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val pts = series.sortBy(p => (p._2.getTime, p._3)).map { p =>
      (p._2.getTime * 1000L, p._3,
        new java.math.BigDecimal(p._4).setScale(6, java.math.RoundingMode.HALF_UP)
          .movePointRight(6).longValueExact)
    }.toIndexedSeq
    val expect = ref(pts, 12).map(p => (1L, p._1, p._2, p._3.toDouble / 1000000.0))
      .sortBy(p => (p._2, p._3))
    assert(got.size == 12 && got == expect)
    // endpoints always survive
    assert(got.head._2 == pts.head._1 && got.last._2 == pts.last._1)
    // n <= k: identity (every point survives, values 6dp-quantized)
    val tiny = series.take(8)
    val tdf = tiny.toDF("user_id", "ts", "event_id", "value")
    assert(TimeSeriesOps.lttb(tdf, k = 12).count() == 8)
    // null value / null ts rows are FILTERED, never fabricated as
    // points at 0 — the selection over the rest is unchanged
    val withNulls = df
      .union(Seq((1L, new java.sql.Timestamp(1704067200000L + 999 * 60000L), 999L,
        None: Option[Double])).toDF("user_id", "ts", "event_id", "value"))
      .union(Seq((1L, null.asInstanceOf[java.sql.Timestamp], 998L,
        Some(1.0): Option[Double])).toDF("user_id", "ts", "event_id", "value"))
    val gotNulls = TimeSeriesOps.lttb(withNulls, k = 12)
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(gotNulls == got)
    // |value| >= 1e12 overflows the decimal(18,6) quantization to null
    // AFTER the explicit null filter; it must be dropped like a null,
    // never fabricated as a point at y=0
    val withOverflow = df
      .union(Seq((1L, new java.sql.Timestamp(1704067200000L + 998 * 60000L), 997L,
        Some(1e13): Option[Double])).toDF("user_id", "ts", "event_id", "value"))
    val gotOverflow = TimeSeriesOps.lttb(withOverflow, k = 12)
      .orderBy("ts_us", "event_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(gotOverflow == got, "quantization overflow must drop, not fabricate y=0")
  }

  test("ohlc ArgExtremum rejects floating-point ordering columns at analysis") {
    // the flat-buffer compare is not NaN-aware; a double ord column
    // would silently diverge from min_by/max_by struct ordering
    val df = Seq((1L, 2.0, 3.0)).toDF("k", "ord", "v")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy("k")
        .agg(graft.functions.ArgExtremum.maxBy(col("v"), col("ord"), col("k")))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("floating"))
  }
}
