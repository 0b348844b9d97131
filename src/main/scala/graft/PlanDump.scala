package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: print the formatted physical plans of the queries whose
  * scale behavior the README/PlanSpec claims rest on.
  * `sbt "runMain graft.PlanDump [sfdir]"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- Seq("td_latest", "td_latest_changes", "rel_join_agg", "x_ann_brute",
        "x_range_join", "x_sessionize", "ts_moving_zscore", "x_pipeline_curate",
        "x_ann_ivf_assigned", "x_dedup_lsh_verified",
        "x_text_lm_score", "x_dedup_spans", "x_embed_kmeans", "x_ann_quantized",
        "x_sample_pergroup", "x_ann_label_purity", "x_dedup_incremental_lsh",
        "x_ann_pq", "x_dedup_index_stored", "x_ann_pq_rerank",
        "x_sketch_cms", "x_sample_weighted", "x_dedup_cdc",
        "x_text_bm25", "x_funnel",
        "x_text_nb", "x_dsir_weights", "x_zorder_layout",
        "x_embed_covariance", "x_mix_temperature", "x_strata_overlap",
        "x_text_ctfidf", "x_quality_calibrated", "x_quality_gopher")) {
      println(s"\n===== $name =====")
      // Literal control characters in plan strings (e.g. the sampler's
      // NUL null-id sentinel) would make PLANS.md a binary file —
      // escape them so the dump stays diffable text.
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
        .flatMap(c => if (c < ' ' && c != '\n' && c != '\t') f"\\u${c.toInt}%04x" else c.toString))
    }
    spark.stop()
  }
}

/** Diagnostic: list every query whose executed plan contains a
  * SortAggregate (the struct-buffer hash-aggregation fallback). */
object SortAggScan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val n = "SortAggregate".r.findAllIn(plan).size
        if (n > 0) println(s"SORTAGG $name: $n")
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
