package graft

import org.apache.spark.sql.SparkSession

/** In-session ingest-layout A/B: build one mirror per fact-table chunk
  * cap, interleave the query list across the mirrors min-of-N — the
  * epoch-immune form of the r14 factCap experiment (which compared
  * composed totals across bench runs and read only 2%).
  *
  * Usage: SPARK_GRAFT_AB=q1,q2 SPARK_GRAFT_CAPS=32,16
  *        sbt "runMain graft.LayoutAb [sfdir]"
  */
object LayoutAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_AB", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_AB=q1,q2,...")
    val caps = sys.env.getOrElse("SPARK_GRAFT_CAPS", "32,16")
      .split(",").map(_.trim.toLong).toSeq
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "7").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "4194304"))
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pid = ProcessHandle.current().pid()
    // divisor-pinned tables get a VOLUME-scaled chunk count on every
    // side of a cap A/B (Bench.chunkDivisors wins over the cap), so a
    // cap sweep that only moves these tables is a no-op by design —
    // say so up front instead of letting it read as a null result
    if (Bench.chunkDivisors.nonEmpty)
      println(s"[layout-ab] divisor-pinned (cap-INVARIANT) tables: " +
        Bench.chunkDivisors.toSeq.sortBy(_._1)
          .map { case (t, d) => s"$t(rows/$d)" }.mkString(", ") +
        " — caps A/B only the remaining tables")
    val dirs = caps.map { cap =>
      val dst = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_layoutab_${cap}_$pid")
      graft.operators.Layout.rechunkMirror(spark, sfDir, dst.getPath,
        (table: String, rows: Long) =>
          Bench.chunkDivisors.get(table)
            .map(d => math.min(32L, math.max(1L, rows / d)).toInt)
            .getOrElse(graft.operators.Layout.defaultChunkPolicy(table, rows, cap)))
      cap -> dst.getPath
    }
    dirs.foreach { case (_, d) => SparkEntry.prewarmBuilds(spark, d) }
    def once(n: String, d: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(n => dirs.foreach { case (_, d) => once(n, d) }) // warm
    val samples = scala.collection.mutable.Map.empty[(String, Long), List[Double]]
      .withDefaultValue(Nil)
    for (_ <- 1 to rounds; n <- names; (cap, d) <- dirs)
      samples((n, cap)) ::= once(n, d)
    for (n <- names) {
      val mins = caps.map(c => c -> samples((n, c)).min)
      println(f"$n%-28s " + mins.map { case (c, v) => f"cap$c%-3d ${v}%.3f" }.mkString("  "))
    }
    val totals = caps.map(c => c -> names.map(n => samples((n, c)).min).sum)
    println("TOTALS " + totals.map { case (c, v) => f"cap$c%-3d ${v}%.3f" }.mkString("  "))
    dirs.foreach { case (_, d) => FsUtil.deleteRecursively(new java.io.File(d)) }
    spark.stop()
  }
}
