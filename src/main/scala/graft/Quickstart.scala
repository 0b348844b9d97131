package graft

import java.sql.Timestamp
import java.time.{Instant, LocalTime}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable quickstart mirroring the reference's notebook walkthrough
  * (examples/quickstart.ipynb): write two forecast revisions, correct a
  * window, then read latest / history / correction chain / backtest
  * views. `sbt "runMain graft.Quickstart"`.
  */
object Quickstart {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = java.nio.file.Files.createTempDirectory("timedb_quickstart").toString
    val db = new TimeDb(spark, base)
    db.create()

    def t(s: String) = Timestamp.from(Instant.parse(s))
    val hours = (0 until 24).map(h => t(f"2024-03-02T$h%02d:00:00Z"))

    // Two forecast runs for the same day: issued the evening before and
    // the morning of (notebook cells 5/7: 50 + bias + 0.5·i).
    def forecast(bias: Double) =
      hours.zipWithIndex.map { case (vt, i) => (42L, vt, 50.0 + bias + 0.5 * i) }
        .toDF("series_id", "valid_time", "value")
    db.write(forecast(5.0), knowledgeTime = Some(t("2024-03-01T18:00:00Z")))
    db.write(forecast(1.0), knowledgeTime = Some(t("2024-03-02T06:00:00Z")))

    println("== latest: one row per hour, the 06:00 revision wins ==")
    db.read(ReadFilter(Seq(42L))).show(5)

    println("== overlapping history: both revisions visible ==")
    db.read(ReadFilter(Seq(42L)), includeKnowledgeTime = true).show(5)

    // An operator corrects hours 10-12 of the winning run (cell 15):
    // same knowledge_time, new change_time — never UPDATE.
    val correction = (10 to 12).map(h => (42L, hours(h), 70.0))
      .toDF("series_id", "valid_time", "value")
      .withColumn("changed_by", lit("operator"))
      .withColumn("annotation", lit("sensor recalibration"))
    db.write(correction, knowledgeTime = Some(t("2024-03-02T06:00:00Z")))

    println("== correction chain of the winning run (collapsed) ==")
    db.read(ReadFilter(Seq(42L)), includeUpdates = true)
      .filter(col("valid_time") === hours(10)).show()

    println("== backtest: intraday view 'as known by 07:00 the same day' ==")
    db.readRelativeDaily(
      ReadFilter(Seq(42L), startValid = Some(hours.head)),
      daysAhead = 0, timeOfDay = LocalTime.of(7, 0)).show(5)

    // Beyond the reference's walkthrough — the commit log the Spark
    // store keeps underneath every write:
    println("== time travel: the table as of the FIRST write's commit ==")
    val versions = db.store.versions()
    db.store.scanValuesAsOf(versions(1)) // v0 = empty create
      .select("series_id", "valid_time", "knowledge_time", "value")
      .orderBy("valid_time").show(3)

    println("== change feed: rows added between the first and last commit ==")
    db.store.scanChangesBetween(versions(1), versions.last)
      .groupBy("knowledge_time").count().orderBy("knowledge_time").show()

    db.delete()
    spark.stop()
  }
}
