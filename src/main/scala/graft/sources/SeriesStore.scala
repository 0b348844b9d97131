package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Physical storage for the two tables, on any Hadoop-compatible
  * filesystem (local dir here; HDFS/S3 on a cluster — all paths go
  * through the Hadoop `FileSystem` API, never `java.io.File`).
  *
  * Layout mirrors the reference's MergeTree physical design
  * (timedb/sql/ch_create_tables.sql:41-42):
  *
  *  - partition dirs `retention=<tier>/valid_month=<yyyyMM>/` — the Spark
  *    analog of `PARTITION BY (retention, toYYYYMM(valid_time))`:
  *    retention-filtered reads prune to one tier, TTL expiry drops whole
  *    directories, and valid_time range predicates prune months.
  *  - rows sorted within each written file by
  *    (series_id, valid_time, knowledge_time, change_time) — the analog of
  *    the MergeTree sort key: Parquet row-group min/max stats on
  *    series_id/valid_time let the reader skip row groups, and ZSTD +
  *    dictionary/RLE encodings replace the per-column codecs.
  */
final class SeriesStore(spark: SparkSession, basePath: String) {

  val valuesPath = s"$basePath/series_values"
  val runSeriesPath = s"$basePath/run_series"

  private def fs = new Path(basePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Idempotent create (timedb/client.py:106-118): materialize both table
    * directories with their schemas via an empty partition-structured
    * write, so reads before any data arrives see the right schema. */
  def create(): Unit = {
    if (!fs.exists(new Path(valuesPath))) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schema.seriesValues)
      appendValues(empty)
    }
    if (!fs.exists(new Path(runSeriesPath))) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schema.runSeries)
      empty.write.mode(SaveMode.Append).parquet(runSeriesPath)
    }
  }

  /** Drop both tables (timedb/client.py:119-120). */
  def delete(): Unit = {
    fs.delete(new Path(valuesPath), true)
    fs.delete(new Path(runSeriesPath), true)
    ()
  }

  /** Append a stamped batch to series_values.
    *
    * `repartition(retention, valid_month)` routes each physical partition's
    * rows to one task (no small-file explosion when a batch spans many
    * months), and `sortWithinPartitions` lays rows out in sort-key order
    * for row-group skipping. Parallel-split/concurrent-lane machinery from
    * the reference (timedb/write.py:81-158) is N/A: Spark writes are
    * already task-parallel.
    */
  def appendValues(stamped: DataFrame): Unit = {
    stamped
      .withColumn("valid_month", Schema.monthOf(col("valid_time")))
      .repartition(col("retention"), col("valid_month"))
      .sortWithinPartitions("series_id", "valid_time", "knowledge_time", "change_time")
      .write
      .mode(SaveMode.Append)
      .partitionBy(Schema.partitionColumns: _*)
      .option("compression", "zstd")
      .parquet(valuesPath)
  }

  def appendRunSeries(rs: DataFrame): Unit =
    rs.write.mode(SaveMode.Append).option("compression", "zstd").parquet(runSeriesPath)

  /** Scan series_values with `retention` (a partition column) restored as
    * a regular data column. `valid_month` stays available for manual
    * pruning; readers project it away. */
  def scanValues(): DataFrame =
    spark.read.schema(
      Schema.seriesValues.add("valid_month", org.apache.spark.sql.types.StringType)
    ).parquet(valuesPath)

  /** Bucketed mirror of series_values for SHUFFLE-FREE series-keyed
    * reads. Spark's bucketed tables expose `HashPartitioning(series_id,
    * n)` to the planner, so every groupBy/window/join clustered on
    * series_id — the latest-read argmax, the change-collapse windows, an
    * equi-join between two mirrors with equal bucket counts — plans
    * with NO exchange: the data is read already laid out for the
    * operation. (The union-based as-of join still shuffles: a union
    * does not preserve its inputs' bucketing.) At 100 TB that converts every repeated read shape from a
    * full-data shuffle into a plain scan; the one-time build cost is a
    * single shuffle. Files are also sorted by (series_id, valid_time),
    * so per-key windows need only a cheap partial sort.
    *
    * The mirror is an EXTERNAL table (data under basePath, metadata in
    * whatever catalog the session has — in-memory works); rebuild after
    * appends, like any materialized layout. */
  def createBucketedMirror(tableName: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    require(tableName.matches("[A-Za-z0-9_]+"), s"unsafe table name: $tableName")
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // per-table data dir: a second mirror must never rewrite the first
    // one's files out from under its catalog entry
    val path = new Path(s"$basePath/bucketed/$tableName")
    fs.delete(path, true)
    scanValues()
      .drop("valid_month")
      .write
      .format("parquet")
      .option("compression", "zstd")
      .option("path", path.toString)
      .bucketBy(nBuckets, "series_id")
      .sortBy("series_id", "valid_time")
      .saveAsTable(tableName)
  }

  /** The bucketed mirror as a DataFrame (bucket partitioning visible to
    * the planner). */
  def scanBucketed(tableName: String): DataFrame = spark.table(tableName)

  /** run_series with the ReplacingMergeTree(first_seen) + FINAL collapse
    * applied at read time (timedb/client.py:207-212,
    * ch_create_tables.sql:58-65): latest first_seen per (series_id,
    * run_id). */
  def scanRunSeries(): DataFrame =
    spark.read.schema(Schema.runSeries).parquet(runSeriesPath)
      .groupBy("series_id", "run_id")
      .agg(max("first_seen").as("first_seen"))

  /** Small-file compaction, the operational complement of streaming
    * ingest (each micro-batch appends at least one file per touched
    * partition — a day of 1-minute batches is 1440 files). Every
    * (retention, valid_month) directory holding more than `maxFiles`
    * files is rewritten as sort-key-ordered files sized near
    * `targetFileBytes` (ClickHouse's merge analog): range-repartition on
    * the sort key (globally ordered files with tight row-group stats),
    * write to a temp dir, then swap via two renames. The swap window is
    * not transactional — run compaction when no concurrent writer
    * targets the same month partition (old months are naturally quiet);
    * a reader racing the swap can retry. Returns the partitions
    * compacted.
    */
  def compactPartitions(maxFiles: Int = 4,
      targetFileBytes: Long = 512L * 1024 * 1024): Seq[String] = {
    val root = new Path(valuesPath)
    if (!fs.exists(root)) return Seq.empty
    val done = Seq.newBuilder[String]
    for {
      tierDir <- fs.listStatus(root).toSeq if tierDir.isDirectory
      monthDir <- fs.listStatus(tierDir.getPath).toSeq if monthDir.isDirectory
    } {
      val files = fs.listStatus(monthDir.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (files.length > maxFiles) {
        val tmp = new Path(monthDir.getPath.getParent, s".compact_${monthDir.getPath.getName}")
        fs.delete(tmp, true)
        val totalBytes = files.map(_.getLen).sum
        val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
        spark.read.parquet(monthDir.getPath.toString)
          .repartitionByRange(nOut, col("series_id"), col("valid_time"),
            col("knowledge_time"), col("change_time"))
          .sortWithinPartitions("series_id", "valid_time", "knowledge_time", "change_time")
          .write.option("compression", "zstd").parquet(tmp.toString)
        val old = new Path(monthDir.getPath.getParent, s".old_${monthDir.getPath.getName}")
        fs.delete(old, true)
        fs.rename(monthDir.getPath, old)
        fs.rename(tmp, monthDir.getPath)
        fs.delete(old, true)
        done += s"${tierDir.getPath.getName}/${monthDir.getPath.getName}"
      }
    }
    done.result()
  }

  /** TTL expiry (ch_create_tables.sql:43-48): month-granular partition
    * drop, like ClickHouse's TTL-aligned partition delete. A
    * (retention=tier, valid_month=m) directory is dropped once every
    * possible valid_time in month m is past its TTL, i.e.
    * lastDay(m) + ttlDays(tier) < asOf. `forever` never expires.
    * Returns the dropped partition directory names.
    */
  def expireRetention(asOf: java.time.Instant): Seq[String] = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMM")
    val root = new Path(valuesPath)
    if (!fs.exists(root)) return Seq.empty
    val dropped = Seq.newBuilder[String]
    for {
      tierDir <- fs.listStatus(root).toSeq if tierDir.isDirectory
      tier = tierDir.getPath.getName.stripPrefix("retention=")
      ttl <- Schema.ttlDays.get(tier).toSeq // 'forever' absent → never expires
      monthDir <- fs.listStatus(tierDir.getPath).toSeq if monthDir.isDirectory
      month = monthDir.getPath.getName.stripPrefix("valid_month=")
    } {
      val ym = java.time.YearMonth.parse(month, fmt)
      val monthEnd = ym.atEndOfMonth().plusDays(1).atStartOfDay(java.time.ZoneOffset.UTC).toInstant
      if (monthEnd.plus(java.time.Duration.ofDays(ttl.toLong)).isBefore(asOf)) {
        fs.delete(monthDir.getPath, true)
        dropped += s"retention=$tier/valid_month=$month"
      }
    }
    dropped.result()
  }
}
