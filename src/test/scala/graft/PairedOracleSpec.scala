package graft

import org.scalatest.funsuite.AnyFunSuite

/** Protocol pin for the bench's same-epoch comparator: the perf gate
  * now reads `paired_ratio` from this co-process, so a silent protocol
  * regression (a renamed field, a stdout stray print, an escaping bug)
  * would quietly unpair every future epoch. Skips (assume) when
  * python3/duckdb are absent — the bench itself degrades the same way,
  * reporting the failure under aux_errors and running unpaired. */
class PairedOracleSpec extends AnyFunSuite {

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb").start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  test("paired oracle co-process: open, time, per-query error isolation") {
    assume(duckdbAvailable, "python3+duckdb not available")
    assume(new java.io.File("tools/paired_oracle.py").isFile)
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val po = PairedOracle.start() match {
      case Right(p)  => p
      case Left(err) => fail(s"start failed: $err")
    }
    try {
      assert(po.open("/root/testdata/sf0.001").isRight)
      // a real oracle over a real table times to a positive wall
      val t = po.time("probe", "SELECT count(*) FROM lineitem", samples = 2)
      assert(t.isRight && t.toOption.get >= 0.0)
      // SQL with quotes and newlines survives the JSON line protocol
      val q = po.time("quoted",
        "SELECT count(*) FROM lineitem\nWHERE l_returnflag = 'N'", samples = 1)
      assert(q.isRight)
      // a broken query reports per-query and does NOT kill the session
      val bad = po.time("bad", "SELECT * FROM no_such_table", samples = 1)
      assert(bad.isLeft, "bad SQL must report an error")
      assert(po.failure.isEmpty, "a per-query error must not break transport")
      val again = po.time("again", "SELECT count(*) FROM orders", samples = 1)
      assert(again.isRight, "the co-process must keep serving after an error")
    } finally po.close()
  }
}
