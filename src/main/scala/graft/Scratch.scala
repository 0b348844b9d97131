package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway profiling driver for round-9 headline work (not shipped
  * as evidence; deleted when the investigation closes). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobCounter = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCounter.incrementAndGet(); ()
      }
    })

    def time(name: String, warm: Int = 2, n: Int = 5)(f: => Unit): Unit = {
      (1 to warm).foreach(_ => f)
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      val j0 = jobCounter.get()
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      org.apache.spark.GraftListenerBridge.drainListenerBus(spark.sparkContext)
      val jobs = (jobCounter.get() - j0) / n
      println(f"SCRATCH $name%-28s min=${ts.min}%.4f med=${ts.sorted.apply(n / 2)}%.4f jobs=$jobs")
    }

    val dst = new java.io.File(sys.props("java.io.tmpdir"), "graft_rechunk_scratch").getPath
    if (!new java.io.File(dst, "_OK").exists()) {
      def chunkPolicy(table: String, rows: Long): Int =
        if (table == "documents") math.min(8L, math.max(1L, rows / 64)).toInt
        else graft.operators.Layout.defaultChunkPolicy(table, rows)
      graft.operators.Layout.rechunkMirror(spark, sfDir, dst, chunkPolicy)
      new java.io.FileOutputStream(new java.io.File(dst, "_OK")).close()
    }
    SparkEntry.prewarmBuilds(spark, dst)

    for (name <- Seq("x_dsir_weights", "x_pipeline_curate", "td_meta_read",
        "td_zmirror_read", "x_mix_temperature",
        "x_embed_covariance", "x_cohort_retention", "x_ann_label_purity",
        "x_ann_ivfpq", "x_text_bm25", "x_text_ctfidf", "x_ann_brute",
        "x_graph_pagerank")) {
      time(name, warm = 2, n = 5)(SparkEntry.queries(name)(spark, dst).count())
    }
    spark.stop()
  }
}
