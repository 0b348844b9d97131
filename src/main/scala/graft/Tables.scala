package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md), plus the
  * `events` → `series_values` surrogate mapping used to exercise the
  * temporal read shapes against an oracle-checkable public table
  * (FIXTURES.md §3).
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  // Memoized per (session, dir, table): a DataFrame is an immutable
  // logical plan, and re-creating it per query re-lists the directory
  // and re-reads parquet footers — pure fixed overhead when the same
  // driver process runs dozens of queries over the same testdata. The
  // cached entry pins the file listing; call [[invalidate]] if the
  // underlying directory changes.
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String, String), DataFrame]

  def invalidate(): Unit = cache.clear()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name), spark.read.parquet(path(dir, name)))

  /** `events` with `ts` normalized to a µs session-TZ timestamp.
    *
    * The driver's testdata generator has shipped `ts` two ways across
    * rounds: ns-precision parquet (which Spark 4 refuses to read as a
    * timestamp — `nanosAsLong` reads raw nanos and we truncate to µs,
    * exactly DuckDB's TIMESTAMP_NS → TIMESTAMP cast) and plain
    * timestamp[us] (read as TIMESTAMP_NTZ — recast to TimestampType
    * under the UTC session so downstream epoch arithmetic and the
    * written comparison parquet keep the same instant semantics either
    * way; SURVEY.md §7.2 "Timestamp precision").
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // ns-as-long encoding
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000"))) // integer div: exact ns→µs truncation
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already a session-TZ timestamp
    }
  }

  /** The bitemporal surrogate frame (FIXTURES.md §3): maps `events` onto
    * the `series_values` axes so argmax/collapse shapes have real work:
    *
    *  - series_id = user_id
    *  - valid_time = hour(ts)  — duplicate keys per series-hour
    *  - knowledge_time = ts    — unique within the hour ⇒ deterministic argmax
    *  - change_time = 2024-01-01 + event_id seconds — monotone audit axis
    *  - value / changed_by / annotation = value / event_type / props
    *  - retention = user_id-derived tier bucket
    */
  def series(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("user_id").as("series_id"),
      date_trunc("hour", col("ts")).as("valid_time"),
      col("ts").as("knowledge_time"),
      timestamp_micros(lit(1704067200000000L) + col("event_id") * 1000000L).as("change_time"),
      col("value"),
      col("event_type").as("changed_by"),
      col("props").as("annotation"),
      when(pmod(col("user_id"), lit(4)) === 0, "short")
        .when(pmod(col("user_id"), lit(4)) === 1, "medium")
        .when(pmod(col("user_id"), lit(4)) === 2, "long")
        .otherwise("forever").as("retention"),
      pmod(col("user_id"), lit(7)).as("run_id")
    )

  /** The same mapping as ANSI SQL for the DuckDB oracle. */
  val seriesOracleSql: String =
    """SELECT user_id AS series_id,
      |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS valid_time,
      |  CAST(ts AS TIMESTAMP) AS knowledge_time,
      |  TIMESTAMP '2024-01-01' + INTERVAL 1 SECOND * event_id AS change_time,
      |  value,
      |  event_type AS changed_by,
      |  props AS annotation,
      |  CASE user_id % 4 WHEN 0 THEN 'short' WHEN 1 THEN 'medium'
      |                   WHEN 2 THEN 'long' ELSE 'forever' END AS retention,
      |  user_id % 7 AS run_id
      |FROM events""".stripMargin

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
