package graft

import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

/** Client for the DuckDB oracle co-process (tools/paired_oracle.py) —
  * the bench's SAME-EPOCH comparator.
  *
  * The committed anchor (BASELINE_MIRROR.json) is a merged-minimum
  * over many independent regen runs; dividing one epoch's Spark walls
  * by it makes the headline ratio swing with co-tenant host load the
  * code never sees (same-code official epochs have read 1.71× and
  * 2.38×). This client re-times each headline query's oracle SQL with
  * DuckDB interleaved between the Spark walls in the SAME process
  * epoch, so both engines inherit the same weather and the paired
  * ratio isolates the engines. The anchor ratio stays reported beside
  * it — cross-round comparability is the anchor's job, epoch
  * robustness is this one's.
  *
  * Failure posture: the paired phase is EVIDENCE, never a gate on the
  * run itself — any failure (python/duckdb missing, co-process crash,
  * per-request timeout) disables pairing, surfaces under aux_errors,
  * and the bench proceeds. A response that never arrives would
  * otherwise hang the whole round, so reads poll a bounded queue fed
  * by a reader thread and a timeout kills the co-process.
  */
final class PairedOracle private (
    proc: Process,
    stdin: java.io.BufferedWriter,
    lines: LinkedBlockingQueue[String]) {

  @volatile private var broken: Option[String] = None
  def failure: Option[String] = broken

  private def fail(msg: String): Left[String, Nothing] = {
    broken = broken.orElse(Some(msg))
    close()
    Left(msg)
  }

  private def request(json: String, timeoutSec: Long): Either[String, String] =
    broken.map(Left(_)).getOrElse {
      try {
        stdin.write(json)
        stdin.newLine()
        stdin.flush()
        Option(lines.poll(timeoutSec, TimeUnit.SECONDS)) match {
          case Some(resp) => Right(resp)
          case None       => fail(s"co-process response timeout (${timeoutSec}s)")
        }
      } catch {
        case e: Throwable => fail("co-process write failed: " + e.getClass.getSimpleName)
      }
    }

  /** Point the co-process at a parquet dir (raw or mirror); view setup
    * is the anchor regen's own (tools/duck_views.py). */
  def open(dir: String, timeoutSec: Long = 120): Either[String, Unit] =
    request(s"""{"open":${JsonUtil.quote(dir)}}""", timeoutSec).flatMap { resp =>
      if (resp.contains("\"ok\"")) Right(())
      else Left("open failed: " + resp.take(200))
    }

  private val secField = """"sec"\s*:\s*([0-9.eE+-]+)""".r
  private val errField = """"error"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  /** Min-of-`samples` DuckDB wall for one oracle SQL (the anchor
    * regen's per-run discipline). A per-QUERY error (bad SQL) is a
    * Left but leaves the co-process serving; only transport failures
    * disable pairing. */
  def time(name: String, sql: String, samples: Int = 3,
      timeoutSec: Long = 300): Either[String, Double] =
    request(
      s"""{"name":${JsonUtil.quote(name)},"sql":${JsonUtil.quote(sql)},"samples":$samples}""",
      timeoutSec).flatMap { resp =>
      secField.findFirstMatchIn(resp) match {
        case Some(m) => Right(m.group(1).toDouble)
        case None =>
          Left(errField.findFirstMatchIn(resp).map(_.group(1))
            .getOrElse("unparseable response: " + resp.take(120)))
      }
    }

  def close(): Unit = {
    try stdin.close() catch { case _: Throwable => () }
    try {
      if (!proc.waitFor(5, TimeUnit.SECONDS)) { proc.destroyForcibly(); () }
    } catch { case _: Throwable => proc.destroyForcibly(); () }
  }
}

object PairedOracle {

  /** Start the co-process; Left (with the reason) when the script or
    * interpreter is unavailable — the caller records it under
    * aux_errors and the bench runs unpaired. */
  def start(script: String = "tools/paired_oracle.py"): Either[String, PairedOracle] = {
    val file = new java.io.File(script)
    if (!file.isFile) return Left(s"$script not found (cwd ${sys.props("user.dir")})")
    try {
      val pb = new ProcessBuilder("python3", file.getPath)
      val proc = pb.start()
      val lines = new LinkedBlockingQueue[String]()
      // reader threads are daemons: a bench JVM exiting on error must
      // not be pinned by a co-process that outlived its use
      val out = new Thread(() => {
        val r = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        try {
          var l = r.readLine()
          while (l != null) { lines.put(l); l = r.readLine() }
        } catch { case _: Throwable => () }
      }, "paired-oracle-stdout")
      out.setDaemon(true)
      out.start()
      // stderr must be drained (a full pipe blocks the child) but is
      // diagnostics only
      val err = new Thread(() => {
        try {
          val s = proc.getErrorStream
          while (s.read() != -1) ()
        } catch { case _: Throwable => () }
      }, "paired-oracle-stderr")
      err.setDaemon(true)
      err.start()
      val writer = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
      Right(new PairedOracle(proc, writer, lines))
    } catch {
      case e: Throwable =>
        Left("could not start python3: " + e.getClass.getSimpleName + ": " +
          String.valueOf(e.getMessage).take(120))
    }
  }
}
