package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming Holt double-exponential smoothing per key — the batch
  * [[graft.operators.TimeSeriesOps.holtLinear]] fold as a stateful
  * Update-mode operator.
  *
  * Order is the whole contract of a recursive fold, and a stream
  * delivers disorder, so the per-key state splits in two:
  *
  *  - COMMITTED (level, trend): the fold over every event at or below
  *    the event-time watermark, applied in (ts, event_id) order. The
  *    watermark guarantees nothing earlier can still arrive, so the
  *    committed fold equals the batch fold over that prefix and is
  *    never reordered retroactively — replay-safe by construction.
  *  - PENDING buffer: events above the watermark, kept sorted and
  *    replayed ON TOP of the committed state for every emission — the
  *    "if the stream ended now" answer. Its size is bounded by the
  *    disorder the watermark tolerates (rate × delay), NOT by history:
  *    the state an executor holds per key is O(watermark window).
  *
  * Every emission therefore equals batch `holtLinear` over all
  * in-tolerance data seen so far (pinned by `StreamingSpec` across
  * micro-batch slicings and cross-batch disorder); the recurrence is
  * evaluated in the kernel's exact operation order, so the equality is
  * bit-level. Data later than the watermark is dropped AT ENTRY by
  * this operator itself: Spark's upstream late-row filter applies to
  * flatMapGroupsWithState only under EventTimeTimeout, so under
  * NoTimeout a too-late row would otherwise reach the function and be
  * folded into the already-committed prefix OUT of order — permanent,
  * silent state corruption. The explicit guard makes the drop
  * deterministic and engine-version-proof.
  *
  * STATE-BOUND EXCEPTION (pre-1970 feeds): the O(watermark window)
  * pending bound assumes the watermark ESTABLISHES. Spark clamps the
  * global watermark at 0, so a feed whose event times are all
  * negative-epoch never establishes one (`getCurrentWatermarkMs()`
  * stays 0 = "no watermark yet"), nothing ever commits, and the
  * pending buffer grows with history. `maxPending` bounds that
  * regime: a key whose buffer would exceed it fails the query LOUDLY
  * (IllegalStateException naming the key and the knob) instead of
  * accumulating executor state until an OOM three days in. Feeds with
  * any post-1970 traffic never approach the cap — their pending size
  * is rate × watermark delay.
  */
object StreamingHolt {

  /** Default pending-buffer cap per key — far above any in-tolerance
    * disorder (rate × delay) a real watermark leaves pending, so it
    * only trips in the no-watermark regime the object doc describes. */
  val DefaultMaxPending: Int = 1 << 20

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  /** (tsUs, event_id, value) triples keep the pending buffer flat. */
  case class HoltState(level: Double, trend: Double, seen: Boolean,
      pending: List[(Long, Long, Double)])
  case class HoltPoint(user_id: Long, n_pending: Int,
      level: Double, trend: Double, forecast: Double)

  private def us(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** One fold step — textually the [[graft.functions.HoltLinear]]
    * recurrence (1−α / 1−β precomputed, same operation order), so the
    * streaming answer is bit-identical to the kernel's. */
  private def fold(level0: Double, trend0: Double, seen0: Boolean,
      events: Iterator[Double], alpha: Double, beta: Double): (Double, Double, Boolean) = {
    val oneMinusAlpha = 1.0 - alpha
    val oneMinusBeta = 1.0 - beta
    var level = level0; var trend = trend0; var seen = seen0
    events.foreach { x =>
      if (!seen) { level = x; trend = 0.0; seen = true }
      else {
        val next = alpha * x + oneMinusAlpha * (level + trend)
        trend = beta * (next - level) + oneMinusBeta * trend
        level = next
      }
    }
    (level, trend, seen)
  }

  /** `stream` needs (user_id: long, ts: timestamp, event_id: long,
    * value: double); rows with null value are skipped upstream of the
    * fold (the kernel's null-skip semantics). */
  def holt(stream: DataFrame, alpha: Double, beta: Double,
      watermark: String, maxPending: Int = DefaultMaxPending): Dataset[HoltPoint] = {
    require(maxPending > 0, "maxPending must be positive")
    import stream.sparkSession.implicits._
    stream.selectExpr("user_id", "ts", "event_id", "value")
      .filter("value IS NOT NULL")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[HoltState, HoltPoint](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, events: Iterator[Ev], state: GroupState[HoltState]) =>
          val prev = state.getOption.getOrElse(HoltState(0.0, 0.0, seen = false, Nil))
          // getCurrentWatermarkMs() reads 0 BEFORE any watermark is
          // established (Spark initializes it at 0), which is
          // indistinguishable from a genuine epoch-0 watermark — and a
          // ts >= 0 'late' filter under the former silently dropped
          // every pre-1970 (negative-epoch) row on every batch. Treat
          // wm == 0 as "no watermark yet": nothing is provably late and
          // nothing is sealed, so everything stays in the pending
          // buffer (replayed each emission — the equality still holds;
          // only the commit is deferred until wm > 0).
          val wmMs = state.getCurrentWatermarkMs()
          val hasWm = wmMs > 0L
          val wmUs = wmMs * 1000L
          // drop rows already later than the watermark (see object doc:
          // Spark's own late filter does not run under NoTimeout); the
          // committed prefix covers everything below wm, so folding a
          // late row would reorder it behind already-folded values
          val buffer = (prev.pending ++ events.map(e => (us(e.ts), e.event_id, e.value))
            .filter(t => !hasWm || t._1 >= wmUs))
            .sortBy(t => (t._1, t._2))
          // commit the prefix the watermark has sealed; replay the rest.
          // STRICTLY below: Spark admits rows AT the watermark, so a
          // ts == wm row can still arrive and must be able to sort
          // against its equal-ts peers by event_id before any of them
          // is folded.
          val (closed, open) =
            if (hasWm) buffer.partition(_._1 < wmUs)
            else (Nil, buffer)
          if (open.size > maxPending)
            throw new IllegalStateException(
              s"StreamingHolt: key $uid has ${open.size} pending events " +
                s"(maxPending = $maxPending). The watermark has not advanced " +
                "past them — for all-pre-1970 feeds it never establishes " +
                "(see the object doc); shift event times or raise maxPending.")
          val (cl, ct, cs) =
            fold(prev.level, prev.trend, prev.seen, closed.iterator.map(_._3), alpha, beta)
          state.update(HoltState(cl, ct, cs, open))
          val (l, t, s) = fold(cl, ct, cs, open.iterator.map(_._3), alpha, beta)
          if (!s) Iterator.empty
          else Iterator.single(HoltPoint(uid, open.size, l, t, l + t))
      }
  }
}
