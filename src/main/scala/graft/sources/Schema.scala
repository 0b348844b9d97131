package graft.sources

import org.apache.spark.sql.types._

/** Storage schema for the 3-dimensional (bitemporal + audit) time-series
  * store.
  *
  * Mirrors the reference's two ClickHouse tables
  * (timedb/sql/ch_create_tables.sql:27-49, 58-65) re-expressed for
  * Parquet + Spark:
  *
  *  - `series_values` — the unified append-only fact table. One row per
  *    observation of a series value, carrying three orthogonal time axes:
  *    `valid_time` (when the value applies), `knowledge_time` (when it
  *    became known / forecast issue time), `change_time` (when the row was
  *    written — the audit axis).
  *  - `run_series` — tiny (series_id, run_id, first_seen) mapping so
  *    "which runs touched this series" never scans the fact table.
  *
  * `UInt64` → `LongType` is safe: run ids are generated 63-bit
  * (timedb/write.py:58-65) and the reference itself round-trips them
  * through a signed BIGINT.
  *
  * `value` is a non-null DOUBLE with NaN as the null sentinel
  * (timedb/read.py:62, timedb/write.py:313); Spark's NaN semantics
  * (NaN = NaN is true, NaN sorts greatest) match ClickHouse's here.
  */
object Schema {

  val seriesValues: StructType = StructType(Seq(
    StructField("series_id", LongType, nullable = false),
    StructField("valid_time", TimestampType, nullable = false),
    StructField("knowledge_time", TimestampType, nullable = false),
    StructField("change_time", TimestampType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("valid_time_end", TimestampType, nullable = false),
    StructField("run_id", LongType, nullable = false),
    StructField("changed_by", StringType, nullable = false),
    StructField("annotation", StringType, nullable = false),
    StructField("retention", StringType, nullable = false)
  ))

  val seriesValuesColumns: Seq[String] = seriesValues.fieldNames.toSeq

  val runSeries: StructType = StructType(Seq(
    StructField("series_id", LongType, nullable = false),
    StructField("run_id", LongType, nullable = false),
    StructField("first_seen", TimestampType, nullable = false)
  ))

  /** Retention tier vocabulary (timedb/write.py:35-41). */
  val retentionTiers: Set[String] = Set("short", "medium", "long", "forever")

  val defaultRetention: String = "forever"

  /** TTL days per tier (timedb/sql/ch_create_tables.sql:43-48);
    * `forever` never expires. */
  val ttlDays: Map[String, Int] =
    Map("short" -> 180, "medium" -> 1095, "long" -> 1825)

  /** `valid_time_end` sentinel ≈ +∞ (ch_create_tables.sql:33-34). */
  val validTimeEndSentinel: java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse("2200-01-01T00:00:00Z"))

  /** Partition column derived from valid_time, mirroring
    * `toYYYYMM(valid_time)` in the reference's partition key
    * (ch_create_tables.sql:41). Kept as a physical partition directory
    * (`retention=<tier>/valid_month=<yyyyMM>/`), so retention-filtered and
    * time-ranged reads prune whole directories — the Spark analog of
    * ClickHouse partition pruning.
    */
  val partitionColumns: Seq[String] = Seq("retention", "valid_month")

  /** THE month derivation — the single definition the writer, the read
    * prune, and the skip-unchanged slab all share, so they agree by
    * construction. Pinned to UTC via `convert_timezone` (a bare
    * `date_format` follows `spark.sql.session.timeZone`, so sessions
    * with different zones would name partition directories differently
    * and month pruning would silently drop valid rows — the reference
    * cannot diverge because it stores DateTime64(6,'UTC')).
    */
  def monthOf(ts: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    date_format(convert_timezone(lit("UTC"), ts), "yyyyMM")
  }

  def monthOf(ts: java.sql.Timestamp): String =
    java.time.format.DateTimeFormatter.ofPattern("yyyyMM")
      .withZone(java.time.ZoneOffset.UTC).format(ts.toInstant)
}
