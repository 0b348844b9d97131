package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterpart of `TimeSeriesOps.sessionize`: gap-based
  * sessions over an unbounded event stream with bounded state.
  *
  * `flatMapGroupsWithState` keys the stream by user and keeps ONE open
  * session per key as state; a session closes (and is emitted, Append
  * mode) either when a same-key event arrives more than `gapSec` after
  * its end, or when the event-time watermark passes `end + gapSec`
  * (EventTimeTimeout) — so idle keys emit without waiting for their next
  * event, and state size is O(active keys), independent of stream
  * length. Late events behind the watermark are dropped by the engine
  * before the function runs; in-batch disorder is absorbed by sorting
  * each micro-batch's group.
  *
  * The batch operator is the oracle for the semantics: replaying a
  * bounded stream through this yields the same sessions as
  * `TimeSeriesOps.sessionize` + groupBy on the equivalent static frame
  * (pinned by `StreamingSpec`).
  */
object StreamingSessionize {

  case class Ev(user_id: Long, ts: Timestamp, value: Double)
  case class OpenSession(startUs: Long, endUs: Long, n: Long, sum: Double)
  case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  private def us(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
  private def tsOf(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  /** `stream` needs (user_id: long, ts: timestamp, value: double). */
  def sessions(stream: DataFrame, gapSec: Long, watermark: String): Dataset[Session] = {
    import stream.sparkSession.implicits._
    val gapUs = gapSec * 1000000L
    stream.selectExpr("user_id", "ts", "value")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, events: Iterator[Ev], state: GroupState[OpenSession]) =>
          def close(s: OpenSession): Session =
            Session(uid, tsOf(s.startUs), tsOf(s.endUs), s.n, s.sum)
          if (state.hasTimedOut) {
            val out = state.getOption.map(close).toList
            state.remove()
            out.iterator
          } else {
            val sorted = events.toList.sortBy(e => us(e.ts))
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = us(e.ts)
              cur = cur match {
                case Some(s) if t - s.endUs <= gapUs =>
                  Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed ::= close(s)
                  Some(OpenSession(t, t, 1, e.value))
                case None =>
                  Some(OpenSession(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout fires once the WATERMARK passes session end + gap
              state.setTimeoutTimestamp(s.endUs / 1000L + gapSec * 1000L)
            }
            closed.reverse.iterator
          }
      }
  }
}
