package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming LTTB downsampling per (key, event-time window) — the
  * batch [[graft.operators.TimeSeriesOps.lttb]] selection as a
  * stateful Update-mode operator.
  *
  * LTTB is a GLOBAL selection: one more point moves every bucket
  * boundary, so a whole-history streaming form would need unbounded
  * state. The streaming face therefore downsamples per event-time
  * WINDOW (the shape a live dashboard actually renders — k points per
  * hour, not k points per all-of-history):
  *
  *  - each key's state holds the raw points of its OPEN windows only,
  *    bounded by (windows inside the watermark tolerance) × (window
  *    rate) — never by history;
  *  - every batch emits the current selection of each window it
  *    touched (`closed = false`: the "if the window ended now" answer,
  *    replayed from the buffered tail);
  *  - once the watermark passes a window's end, the FINAL selection
  *    emits (`closed = true`) and the window's state is dropped. A
  *    sealed emission is bit-identical to batch `lttb` over the same
  *    window's rows — the selection runs through the SAME compiled
  *    kernel entry point ([[graft.functions.LttbSelect.compute]]) on
  *    the same quantized longs, and the quantization mirrors the batch
  *    column expression operation-for-operation (decimal(18,6)
  *    HALF_UP, ×1e6, overflow → row skipped like the batch try_cast).
  *
  * Late rows are dropped AT ENTRY under the same discipline (and the
  * same pre-watermark guard) as [[StreamingHolt]]: Spark's upstream
  * late filter does not run for flatMapGroupsWithState under
  * NoTimeout, and a watermark of 0 means "no watermark yet", not
  * "epoch 0 is sealed" — pre-1970 windows must survive their first
  * batches.
  *
  * QUIESCENT KEYS: by default (`flushQuiescent = false`) sealing
  * happens at the key's next invocation after the watermark passes, so
  * a key that stops receiving traffic never emits its final selection
  * and its state is never dropped — consumers filtering on
  * `closed = true` MUST NOT assume every window eventually seals under
  * the default. `flushQuiescent = true` switches the operator to
  * `GroupStateTimeout.EventTimeTimeout`: each key arms a timer at its
  * earliest open window's end, so sealed selections flush (and their
  * state drops) as the watermark passes, traffic or not. The trade-off
  * is deliberate and documented rather than defaulted: under
  * EventTimeTimeout Spark's OWN late filter runs upstream of the
  * function (rows with ts < watermark are dropped by the engine, which
  * matches this operator's entry guard — no semantic change there),
  * but that engine filter compares against the 0-clamped watermark, so
  * an all-pre-1970 feed loses every row. Default mode supports
  * pre-1970 event times; flush mode requires post-1970 ones.
  *
  * STATE-BOUND EXCEPTION (pre-1970 feeds, default mode): the
  * O(open windows × rate) buffer bound assumes the watermark
  * establishes; Spark clamps it at 0, so an all-negative-epoch feed
  * never seals a window and every key's buffers grow with history.
  * `maxBuffered` bounds that regime loudly — a key whose total
  * buffered points would exceed it throws (naming the key and the
  * knob) instead of accumulating state forever, exactly like
  * [[StreamingHolt]]'s `maxPending`.
  */
object StreamingLttb {

  /** Default cap on buffered points per key across its open windows —
    * far above (watermark tolerance / window) × rate for any feed with
    * a live watermark; trips only in the no-watermark regime. */
  val DefaultMaxBuffered: Int = 1 << 20

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  /** (windowStartUs → buffered (tsUs, event_id, yMicro) points). */
  case class LttbState(windows: Map[Long, Vector[(Long, Long, Long)]])
  case class SelPoint(ts_us: Long, event_id: Long, value: Double)
  case class LttbWindow(user_id: Long, window_start_us: Long, closed: Boolean,
      n_raw: Int, points: Seq[SelPoint])

  private def us(t: Timestamp): Long =
    t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L

  /** The batch quantization, mirrored operation-for-operation:
    * Spark's double→decimal(18,6) cast is scala BigDecimal(v) (the
    * shortest-decimal valueOf form) rounded HALF_UP at scale 6; values
    * past 12 integer digits overflow the decimal and the batch path
    * (try_cast + null filter) SKIPS the row, so this returns None. */
  private[streaming] def quantize(v: Double): Option[Long] = {
    if (v.isNaN || v.isInfinite) return None
    val scaled = scala.math.BigDecimal(v)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
    if (scaled.abs >= StreamingLttb.decimalCap) None
    else Some((scaled * scala.math.BigDecimal(1000000)).toLongExact)
  }
  private val decimalCap = scala.math.BigDecimal(10).pow(12)

  /** Selection through the SAME kernel entry point the batch column
    * uses — bit-identity by construction, not by re-derivation. */
  private def select(pts: Vector[(Long, Long, Long)], k: Int): Seq[SelPoint] = {
    val sorted = pts.sorted
    val arr = new GenericArrayData(
      sorted.map { case (x, i, y) => InternalRow(x, i, y) }.toArray[Any])
    val out = graft.functions.LttbSelect.compute(arr, k)
    (0 until out.numElements()).map { j =>
      val r = out.getStruct(j, 3)
      SelPoint(r.getLong(0), r.getLong(1), r.getLong(2).toDouble / 1000000.0)
    }
  }

  /** `stream` needs (user_id: long, ts: timestamp, event_id: long,
    * value: double); null ts / null value rows are filtered upstream of
    * the buffer (the batch operator's row-level null-skip). */
  def lttb(stream: DataFrame, k: Int, windowSec: Long,
      watermark: String, maxBuffered: Int = DefaultMaxBuffered,
      flushQuiescent: Boolean = false): Dataset[LttbWindow] = {
    require(k >= 3, "lttb target size k must be >= 3")
    require(windowSec >= 1, "windowSec must be >= 1")
    require(maxBuffered > 0, "maxBuffered must be positive")
    val winUs = windowSec * 1000000L
    val timeout =
      if (flushQuiescent) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    import stream.sparkSession.implicits._
    stream.selectExpr("user_id", "ts", "event_id", "value")
      .filter("ts IS NOT NULL AND value IS NOT NULL")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LttbState, LttbWindow](
        OutputMode.Update, timeout) {
        (uid: Long, events: Iterator[Ev], state: GroupState[LttbState]) =>
          val prev = state.getOption.getOrElse(LttbState(Map.empty))
          // watermark-0 = "not yet established" (the StreamingHolt
          // guard): nothing is provably late, nothing seals
          val wmMs = state.getCurrentWatermarkMs()
          val hasWm = wmMs > 0L
          val wmUs = wmMs * 1000L
          val fresh = events.flatMap { e =>
            val t = us(e.ts)
            if (hasWm && t < wmUs) None // proven late — drop at entry
            else quantize(e.value).map(y => (Math.floorDiv(t, winUs) * winUs, (t, e.event_id, y)))
          }.toVector
          val touched = fresh.map(_._1).toSet
          val merged = fresh.foldLeft(prev.windows) { case (m, (w, p)) =>
            m.updated(w, m.getOrElse(w, Vector.empty) :+ p)
          }
          val (closed, open) = merged.partition { case (w, _) => hasWm && w + winUs <= wmUs }
          val buffered = open.valuesIterator.map(_.size).sum
          if (buffered > maxBuffered)
            throw new IllegalStateException(
              s"StreamingLttb: key $uid holds $buffered buffered points " +
                s"across ${open.size} open windows (maxBuffered = $maxBuffered). " +
                "The watermark has not sealed them — for all-pre-1970 feeds it " +
                "never establishes (see the object doc); shift event times or " +
                "raise maxBuffered.")
          if (open.isEmpty) state.remove()
          else {
            state.update(LttbState(open))
            // arm the flush timer at the earliest open window's end so
            // a quiescent key still seals when the watermark passes it
            // (strictly beyond the current watermark, as Spark requires)
            if (flushQuiescent) {
              val fireMs = open.keysIterator.map(w => (w + winUs) / 1000L + 1L).min
              state.setTimeoutTimestamp(math.max(fireMs, wmMs + 1L))
            }
          }
          val sealedOut = closed.toSeq.sortBy(_._1).iterator.map { case (w, pts) =>
            LttbWindow(uid, w, closed = true, pts.size, select(pts, k))
          }
          val liveOut = open.filter { case (w, _) => touched(w) }
            .toSeq.sortBy(_._1).iterator.map { case (w, pts) =>
              LttbWindow(uid, w, closed = false, pts.size, select(pts, k))
            }
          sealedOut ++ liveOut
      }
  }
}
