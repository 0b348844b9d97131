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
/** Repeated-source sweep: flag every registered query whose EXECUTED
  * plan scans the same parquet location more than once. A repeated
  * scan is either a deliberate multi-pass (self-join, union of slices,
  * two legs of a comparison query) or the silent
  * pruning-breaks-ReuseExchange failure r14 found in
  * `x_pipeline_curate` (column pruning tailors each consumer branch's
  * projection, the exchanges stop canonicalizing equal, and a shared
  * expensive input evaluates once per branch). The sweep can't tell
  * intent apart — it prints (query, location, count) and the human
  * adjudicates; the value is that NEW accidental double-scans surface
  * as a diff against the committed expectations below instead of as a
  * bench regression three rounds later. */
object DoubleScanScan {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // executedPlan.toString renders scans as
    // `Location: InMemoryFileIndex(1 paths)[file:/...]` (the formatted
    // explain drops the paths-count parens — match both)
    val loc = """Location: [^\[\]]*\[([^\],]+)""".r
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val counts = loc.findAllMatchIn(plan).map(_.group(1)).toSeq
          .groupBy(identity).view.mapValues(_.size).toSeq
          .filter(_._2 > 1).sortBy(_._1)
        counts.foreach { case (l, n) =>
          val short = l.split('/').takeRight(2).mkString("/")
          println(s"MULTISCAN $name: $short x$n")
        }
      } catch { case e: Throwable => println(s"ERR $name: ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}

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
