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
  * batches. Like StreamingHolt's commit, sealing happens at the key's
  * next invocation after the watermark passes (a key with no further
  * traffic seals on its next event; eager sealing would need an
  * event-time timeout, which this operator deliberately leaves to the
  * caller's trigger policy).
  */
object StreamingLttb {

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
      watermark: String): Dataset[LttbWindow] = {
    require(k >= 3, "lttb target size k must be >= 3")
    require(windowSec >= 1, "windowSec must be >= 1")
    val winUs = windowSec * 1000000L
    import stream.sparkSession.implicits._
    stream.selectExpr("user_id", "ts", "event_id", "value")
      .filter("ts IS NOT NULL AND value IS NOT NULL")
      .withWatermark("ts", watermark)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LttbState, LttbWindow](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
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
          if (open.isEmpty) state.remove() else state.update(LttbState(open))
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
