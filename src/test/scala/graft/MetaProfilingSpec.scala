package graft

import org.apache.spark.sql.functions._

import graft.sources.MetaSource

/** MetaSource catalog resolution (J4/S8) and Profiling phase timers
  * (SURVEY §2.11). */
class MetaProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def catalog = Seq(
    (1L, "root/a/1", "n1", "forever", "price"),
    (2L, "root/a/2", "n2", "short", "price"),
    (3L, "root/b/3", "n3", "short", "volume"),
    (4L, "rootx/4", "n4", "long", "price"))
    .toDF("series_id", "path", "name", "retention", "data_type")

  test("rootPath resolves the subtree (root + descendants), not prefixes of other roots") {
    val (ids, rets) = MetaSource(catalog, rootPath = Some("root/a")).resolve()
    assert(ids.sorted == Seq(1L, 2L))
    assert(rets.toSet == Set("forever", "short"))
    // 'rootx/4' must NOT match rootPath 'root' (path-segment boundary)
    val (ids2, _) = MetaSource(catalog, rootPath = Some("root")).resolve()
    assert(ids2.sorted == Seq(1L, 2L, 3L))
  }

  test("paths / names addressing and data_type narrowing") {
    val (byPath, _) = MetaSource(catalog, paths = Seq("root/b/3", "rootx/4")).resolve()
    assert(byPath.sorted == Seq(3L, 4L))
    val (byName, _) = MetaSource(catalog, names = Seq("n1", "n3"), dataType = Some("price")).resolve()
    assert(byName == Seq(1L))
  }

  test("exactly one addressing field is required") {
    intercept[IllegalArgumentException](MetaSource(catalog).resolve())
    intercept[IllegalArgumentException](
      MetaSource(catalog, rootPath = Some("r"), names = Seq("n1")).resolve())
  }

  test("profiling: off by default (no overhead), records totals when on") {
    Profiling.reset()
    assert(Profiling.phase("x") { 42 } == 42)
    assert(Profiling.snapshot().isEmpty) // off → nothing recorded
    Profiling.enable()
    try {
      Profiling.phase(Profiling.PhaseReadTotal) { Thread.sleep(5) }
      Profiling.phase(Profiling.PhaseReadTotal) { Thread.sleep(5) }
      val snap = Profiling.snapshot()
      val (secs, n) = snap(Profiling.PhaseReadTotal)
      assert(n == 2 && secs >= 0.01)
    } finally { Profiling.disable(); Profiling.reset() }
  }

  test("TimeDb read/write record phases when enabled") {
    val base = java.nio.file.Files.createTempDirectory("timedb_prof").toString
    val db = new TimeDb(spark, base)
    db.create()
    Profiling.enable()
    try {
      db.write(Seq((1L, ts("2024-01-01T00:00:00Z"), 1.0)).toDF("series_id", "valid_time", "value"))
      db.read(ReadFilter(Seq(1L))).collect()
      val snap = Profiling.snapshot()
      assert(snap.contains(Profiling.PhaseWriteTotal))
      assert(snap.contains(Profiling.PhaseWriteSeriesValuesInsert))
      assert(snap.contains(Profiling.PhaseReadTotal))
    } finally { Profiling.disable(); Profiling.reset(); db.delete() }
  }
}
