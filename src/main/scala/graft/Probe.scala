package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main for quick environment checks; not part of the API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("event_id"), col("ts"),
      timestamp_micros((col("ts") / 1000L).cast("long")).as("ts_us")).show(3, false)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").printSchema()
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").printSchema()
    println("conv: " + spark.range(1)
      .select(conv(substring(md5(lit("hello").cast("binary")), 1, 15), 16, 10).cast("long")).head)
    println("nan: " + spark.range(1)
      .select(lit(Double.NaN) === lit(Double.NaN), lit(Double.NaN) <=> lit(Double.NaN)).head)
    spark.stop()
  }
}
