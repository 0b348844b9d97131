package graft

import org.apache.spark.sql.DataFrame

import graft.operators.ReadShapes

/** Pins the four read-shape semantics on handcrafted correction chains
  * (reference scenarios: timedb/tests/test_integration.py:70-102 and
  * read.py shape docstrings). */
class ReadShapesSpec extends SparkSpec {
  import spark.implicits._

  // (sid, vt, kt, ct, value, changed_by, annotation)
  private def frame(rows: Seq[(Long, String, String, String, Double, String, String)]): DataFrame =
    rows.map { case (s, vt, kt, ct, v, cb, an) => (s, ts(vt), ts(kt), ts(ct), v, cb, an) }
      .toDF("series_id", "valid_time", "knowledge_time", "change_time",
        "value", "changed_by", "annotation")

  private val base = frame(Seq(
    // series 1, vt 10:00 — two issues; second issue has a correction chain
    (1L, "2024-01-01T10:00:00Z", "2024-01-01T06:00:00Z", "2024-01-01T06:00:00Z", 1.0, "a", ""),
    (1L, "2024-01-01T10:00:00Z", "2024-01-01T08:00:00Z", "2024-01-01T08:00:00Z", 2.0, "a", ""),
    (1L, "2024-01-01T10:00:00Z", "2024-01-01T08:00:00Z", "2024-01-01T09:00:00Z", 3.0, "b", ""),
    // duplicate state rewrite — must collapse in change views
    (1L, "2024-01-01T10:00:00Z", "2024-01-01T08:00:00Z", "2024-01-01T09:30:00Z", 3.0, "b", ""),
    // series 1, vt 11:00 — single row
    (1L, "2024-01-01T11:00:00Z", "2024-01-01T06:00:00Z", "2024-01-01T06:00:00Z", 9.0, "a", "")))

  test("latest picks max (kt, ct) per (sid, vt)") {
    val got = ReadShapes.latest(base).orderBy("series_id", "valid_time")
      .as[(Long, java.sql.Timestamp, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, ts("2024-01-01T10:00:00Z"), 3.0),
      (1L, ts("2024-01-01T11:00:00Z"), 9.0)))
  }

  test("overlapping keeps one row per (sid, vt, kt), max ct") {
    val got = ReadShapes.overlapping(base)
      .orderBy("series_id", "valid_time", "knowledge_time")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Double)].collect()
    assert(got.map(_._4).toSeq == Seq(1.0, 3.0, 9.0))
  }

  test("latestWithChanges restricts to winning kt and collapses duplicate states") {
    val got = ReadShapes.latestWithChanges(base)
      .orderBy("series_id", "valid_time", "change_time")
      .select("series_id", "valid_time", "value")
      .as[(Long, java.sql.Timestamp, Double)].collect()
    // winning kt = 08:00 for vt 10:00 → chain (2.0 → 3.0), dup 3.0 collapsed;
    // vt 11:00 single row.
    assert(got.map(_._3).toSeq == Seq(2.0, 3.0, 9.0))
  }

  test("overlappingWithChanges emits every real transition per (sid, kt, vt)") {
    val got = ReadShapes.overlappingWithChanges(base)
      .orderBy("series_id", "valid_time", "knowledge_time", "change_time")
      .select("value").as[Double].collect()
    assert(got.toSeq == Seq(1.0, 2.0, 3.0, 9.0))
  }

  test("change collapse treats NaN state as equal to NaN (sentinel semantics)") {
    val nanChain = frame(Seq(
      (5L, "2024-01-01T00:00:00Z", "2024-01-01T00:00:00Z", "2024-01-01T01:00:00Z", Double.NaN, "x", ""),
      (5L, "2024-01-01T00:00:00Z", "2024-01-01T00:00:00Z", "2024-01-01T02:00:00Z", Double.NaN, "x", ""),
      (5L, "2024-01-01T00:00:00Z", "2024-01-01T00:00:00Z", "2024-01-01T03:00:00Z", 1.0, "x", "")))
    val got = ReadShapes.overlappingWithChanges(nanChain).select("value").as[Double].collect()
    // NaN→NaN is NOT a transition; NaN→1.0 is.
    assert(got.length == 2 && got(0).isNaN && got(1) == 1.0)
  }

  test("windowCutoff floors to window start + offset, incl. pre-origin times") {
    import org.apache.spark.sql.functions._
    val df = Seq(ts("2024-01-01T07:30:00Z"), ts("2023-12-31T22:00:00Z")).toDF("vt")
    val got = df.select(ReadShapes.windowCutoff(col("vt"), 21600, 3600,
      lit(ts("2024-01-01T00:00:00Z"))).as("c")).as[java.sql.Timestamp].collect()
    assert(got(0) == ts("2024-01-01T07:00:00Z")) // 06:00 block + 1h
    assert(got(1) == ts("2023-12-31T19:00:00Z")) // 18:00 block (pre-origin) + 1h
  }
}
