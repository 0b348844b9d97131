package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of `TimeSeriesOps.sessionize`: gap-based
  * sessions over an unbounded event stream with bounded state.
  *
  * `flatMapGroupsWithState` keys the stream by user; state is the list
  * of OPEN sessions still inside the watermark horizon (not just one —
  * events may arrive out of order across micro-batches as long as they
  * are above the watermark, so several gap-separated sessions per key
  * can all still grow). Each batch merges its events interval-style
  * into that list; a session is emitted (Append mode) only once the
  * event-time watermark passes `end + gap` — at that point no
  * above-watermark event can extend it, so the result is final. Idle
  * keys flush via EventTimeTimeout without needing another event.
  * State size is O(active sessions within the watermark horizon) per
  * key, independent of stream length; events behind the watermark are
  * dropped by the engine before the function runs.
  *
  * Replaying a bounded stream yields exactly the sessions of
  * `TimeSeriesOps.sessionize` + groupBy on the equivalent static frame
  * — including cross-batch disorder — pinned by `StreamingSpec`.
  * Session sums accumulate as exact decimals (each value rounded once to
  * 18 fractional digits on entry), so `sum_value` is independent of
  * batch-arrival merge order; it equals the batch double sum whenever
  * that sum is exact, and matches it to the double rounding of the exact
  * total otherwise. Values outside the exact-decimal range — NaN,
  * ±Infinity, |v| ≥ 1e18 (the decimal(38,18) state encoding bound) —
  * accumulate on a double side-channel instead of crashing the query:
  * they propagate into `sum_value` with plain double semantics (NaN/Inf
  * sticky, like the batch double sum), at the cost of order-independence
  * for only those values.
  *
  * MIGRATION: the decimal accumulator changed the `OpenSession` state
  * encoding — a query checkpointed under the earlier double-sum state
  * schema fails Spark's state-schema compatibility check on restart and
  * must start from a fresh checkpoint directory (reprocessing from the
  * source or accepting the gap).
  */
object StreamingSessionize {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, endUs: Long, n: Long,
      sum: java.math.BigDecimal, sumNf: Double)
  case class SessState(open: List[OpenSession])
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  private def us(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  private def tsOf(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  /** Sorted-by-start interval merge: adjacent sessions closer than the
    * gap collapse into one. Events enter as unit sessions. */
  private def merge(sessions: List[OpenSession], gapUs: Long): List[OpenSession] =
    sessions.sortBy(s => (s.startUs, s.endUs)).foldLeft(List.empty[OpenSession]) {
      case (prev :: rest, s) if s.startUs - prev.endUs <= gapUs =>
        prev.copy(endUs = math.max(prev.endUs, s.endUs),
          n = prev.n + s.n, sum = prev.sum.add(s.sum),
          sumNf = prev.sumNf + s.sumNf) :: rest
      case (acc, s) => s :: acc
    }.reverse

  /** `stream` needs (user_id: long, ts: timestamp, value: double). */
  def sessions(stream: DataFrame, gapSec: Long, watermark: String): Dataset[Session] = {
    import stream.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    stream.selectExpr("user_id", "ts", "value")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, events: Iterator[Ev], state: GroupState[SessState]) =>
          def close(s: OpenSession): Session =
            Session(uid, tsOf(s.startUs), tsOf(s.endUs), s.n,
              if (s.sumNf == 0.0) s.sum.doubleValue else s.sum.doubleValue + s.sumNf)
          val zero = java.math.BigDecimal.ZERO
          // One rounding per EVENT (not per merge): sums of scale-18
          // decimals are exact, so the total is merge-order-independent.
          // Non-finite / out-of-decimal-range values ride the double
          // side-channel (see object doc).
          val incoming = events.map { e =>
            val decimalSafe = java.lang.Double.isFinite(e.value) && math.abs(e.value) < 1e18
            OpenSession(us(e.ts), us(e.ts), 1,
              if (decimalSafe)
                new java.math.BigDecimal(e.value).setScale(18, java.math.RoundingMode.HALF_EVEN)
              else zero,
              if (decimalSafe) 0.0 else e.value)
          }.toList
          val open = merge(state.getOption.map(_.open).getOrElse(Nil) ++ incoming, gapUs)
          // A session is final iff the watermark passed end + gap: any
          // surviving event has ts >= watermark > end + gap, too late to
          // merge with it.
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (finished, stillOpen) = open.partition(s => s.endUs + gapUs < wmUs)
          if (stillOpen.isEmpty) state.remove()
          else {
            state.update(SessState(stillOpen))
            // fire when the earliest still-open session becomes final
            // (must be strictly beyond the current watermark)
            val fireMs = stillOpen.map(s => s.endUs / 1000L + gapSec * 1000L + 1L).min
            state.setTimeoutTimestamp(math.max(fireMs, state.getCurrentWatermarkMs() + 1L))
          }
          finished.sortBy(_.startUs).map(close).iterator
      }
  }
}
