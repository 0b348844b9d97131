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

    // Headline queries: one representative per operator family (the full
    // query matrix runs under Verify; timing all of them would mostly
    // measure N× fixed per-query planning overhead).
    val headline = Seq(
      "td_latest", "td_overlapping", "td_latest_changes", "td_overlapping_changes",
      "td_relative", "td_skip_unchanged", "td_where", "td_meta_read",
      "rel_agg", "rel_join_agg", "rel_window", "rel_topk",
      "x_dedup_exact", "x_dedup_lsh", "x_ann_brute", "x_text_quality",
      "ts_asof_join", "ts_resample_fill", "x_pipeline_curate")

    // Round-2 additions, timed separately so `value` stays comparable
    // across rounds: the headline set and its total are unchanged; the
    // extended set reports in its own JSON key.
    val extended = Seq(
      "rel_rollup", "rel_setops", "ts_moving_zscore", "ts_seasonal",
      "x_sessionize", "x_dedup_clusters", "x_dedup_winners", "x_range_join",
      "x_text_tfidf", "x_simhash_neardup", "x_ann_ivf_probe", "x_feature_lags",
      "x_approx_distinct")

    // Warmup: run every headline query once at the smallest scale factor
    // (sibling sf0.001 dir when present) so whole-stage-codegen compiles,
    // plan caches, and JIT are charged to the warmup, not the measurement.
    // Cold planning is fixed per-query overhead; the measured steady-state
    // throughput is what scales to the 100 TB target. Warmup failures are
    // ignored here — the measured pass reports them.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory) sibling.getPath else sfDir
    }
    (headline ++ extended).foreach { name =>
      try SparkEntry.queries(name)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    // A query that throws is recorded as an error (not a near-zero time):
    // it is excluded from the total and flagged, so a broken query can
    // never masquerade as a speedup.
    def run(names: Seq[String]): Seq[(String, Either[String, Double])] = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        name -> Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          name -> Left(e.getClass.getSimpleName + ": " + String.valueOf(e.getMessage).take(120))
      }
    }
    def toJson(rs: Seq[(String, Either[String, Double])]): String = rs.map {
      case (k, Right(v))  => JsonUtil.quote(k) + ":" + v
      case (k, Left(msg)) => JsonUtil.quote(k) + ":" + JsonUtil.quote("ERROR " + msg)
    }.mkString("{", ",", "}")
    val results = run(headline)
    val extResults = run(extended)
    val errors = (results ++ extResults).collect { case (k, Left(_)) => k }
    val total = results.collect { case (_, Right(v)) => v }.sum
    val extTotal = extResults.collect { case (_, Right(v)) => v }.sum
    val errJson = errors.map(JsonUtil.quote).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${toJson(results)},""" +
      s""""extended":${toJson(extResults)},"extended_total":$extTotal,""" +
      s""""errors":$errJson,"sf":"$sfDir"}""")
    if (errors.nonEmpty) { spark.stop(); sys.exit(1) }
    spark.stop()
  }
}
