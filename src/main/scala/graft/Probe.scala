package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad main for quick environment checks; not part of the API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name ($r)")
    }
    val docs = Tables.documents(spark, dir)
    time("warmup")(docs.count())
    time("docs scan")(docs.count())
    time("tokens split")(docs.select(explode(split(col("text"), " "))).count())
    time("shingleStream")(operators.Dedup.shingleStream(docs, 2).count())
    time("shingles distinct")(operators.Dedup.shingles(docs, 2).count())
    time("hash only")(docs.select(functions.Portable.hash32(col("text"))).count())
    time("minhash sigs")(operators.Dedup.minHashSignatures(docs, 2, 16).count())
    time("simhash")(operators.Dedup.simHash(docs, 2).count())
    time("jaccard")(operators.Dedup.ngramJaccardPairs(docs, 2, 0.05, 50).count())
    time("explode+md5")(docs.select(posexplode(split(col("text"), " ")))
      .select(functions.Portable.hash32(col("col"))).count())
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    time("explode+md5+lead")(docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos"), functions.Portable.hash32(col("col")).as("h1"))
      .withColumn("h2", lead(col("h1"), 1).over(w))
      .filter(col("h2").isNotNull)
      .select(pmod(col("h1") * 1000003L + col("h2"), lit(2147483647L)).as("sh")).count())
    spark.stop()
  }
}
