package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicLong, AtomicBoolean}

/** Opt-in phase timers (timedb/profiling.py:29-54, 99-125): same
  * phase-name surface as the reference, near-zero overhead when off.
  * The Spark UI / event log covers executor-side detail; these cover
  * the client-visible phases of read/write calls.
  */
object Profiling {
  val PhaseReadTotal = "read_total"
  val PhaseReadPlan = "read_plan"
  val PhaseWriteTotal = "write_total"
  val PhaseWriteNormalize = "write_normalize"
  val PhaseWriteSkipUnchanged = "write_skip_unchanged"
  val PhaseWriteSeriesValuesInsert = "write_series_values_insert"
  val PhaseWriteRunSeriesInsert = "write_run_series_insert"

  private val enabled = new AtomicBoolean(false)
  private val totalsNanos = new ConcurrentHashMap[String, AtomicLong]()
  private val counts = new ConcurrentHashMap[String, AtomicLong]()

  def enable(): Unit = enabled.set(true)
  def disable(): Unit = enabled.set(false)
  def isEnabled: Boolean = enabled.get()

  def reset(): Unit = { totalsNanos.clear(); counts.clear() }

  /** Time `f` under `phase` when profiling is on; pass-through when off. */
  def phase[T](name: String)(f: => T): T =
    if (!enabled.get()) f
    else {
      val t0 = System.nanoTime()
      try f finally record(name, System.nanoTime() - t0)
    }

  def record(name: String, nanos: Long): Unit = {
    totalsNanos.computeIfAbsent(name, _ => new AtomicLong()).addAndGet(nanos)
    counts.computeIfAbsent(name, _ => new AtomicLong()).incrementAndGet()
    ()
  }

  /** (total seconds, call count) per phase. */
  def snapshot(): Map[String, (Double, Long)] = {
    import scala.jdk.CollectionConverters._
    totalsNanos.asScala.map { case (k, v) =>
      k -> (v.get() / 1e9, Option(counts.get(k)).map(_.get()).getOrElse(0L))
    }.toMap
  }
}
