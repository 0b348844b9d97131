package graft
import org.apache.spark.sql.SparkSession
object PlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4194304")
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dst = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_plancost_mirror_${ProcessHandle.current().pid()}")
    graft.operators.Layout.rechunkMirror(spark, sfDir, dst.getPath, Bench.chunkPolicy)
    val dir = dst.getPath
    SparkEntry.prewarmBuilds(spark, dir)
    val names = args.toSeq.filterNot(_.startsWith("/")) match {
      case Nil => Seq("x_mix_temperature", "x_dsir_weights", "x_text_bm25",
        "x_text_ctfidf", "x_dedup_incremental_bloom", "x_quality_gate_approx",
        "x_cohort_retention", "rel_setops", "rel_histogram", "x_hybrid_rrf",
        "x_sql_neardup", "x_dedup_cdc_pairs", "x_ann_index_stored", "x_skew_profile")
      case xs => xs
    }
    names.foreach(n => try SparkEntry.queries(n)(spark, dir).count()
      catch { case _: Throwable => () })
    for (n <- names) {
      var bp = Double.MaxValue; var be = Double.MaxValue
      for (_ <- 1 to 7) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, dir)
        df.queryExecution.executedPlan
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        bp = math.min(bp, (t1 - t0) / 1e9); be = math.min(be, (t2 - t1) / 1e9)
      }
      println(f"$n%-28s plan $bp%.3f exec $be%.3f")
    }
    FsUtil.deleteRecursively(dst)
    spark.stop()
  }
}
