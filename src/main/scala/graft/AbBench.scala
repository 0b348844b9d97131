package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for epoch-immune plan A/Bs: time an arbitrary list of
  * registry queries INTERLEAVED in one session (A,B,A,B,… rounds), so
  * both variants inherit the same host weather — cross-epoch A/Bs on
  * this box routinely differ 1.5× on zero code change, which is noise
  * the alternation cancels. Same session profile as [[Bench]] (shuffle
  * partitions, AQE off, scan-split sizing, re-chunked mirror).
  *
  * Usage: SPARK_GRAFT_AB=q1,q2[,q3…] [SPARK_GRAFT_AB_ROUNDS=7]
  *        sbt "runMain graft.AbBench [sfdir]"
  * Prints per-query min/median over the rounds. Never writes artifact
  * files — this is a dev loop, not an evidence producer.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_AB", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(names.nonEmpty, "set SPARK_GRAFT_AB=q1,q2,...")
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

    val dst = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_ab_mirror_${ProcessHandle.current().pid()}")
    graft.operators.Layout.rechunkMirror(spark, sfDir, dst.getPath, Bench.chunkPolicy)
    val dir = dst.getPath
    SparkEntry.prewarmBuilds(spark, dir)

    val lookup = SparkEntry.queries ++ SparkEntry.devQueries
    def once(n: String): Double = {
      val t0 = System.nanoTime()
      lookup(n)(spark, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // warm: codegen + first-touch listings
    val samples = names.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    for (_ <- 1 to rounds; n <- names) samples(n) += once(n)
    for (n <- names) {
      val s = samples(n).sorted
      println(f"$n%-36s min ${s.head}%.3f  med ${s(s.size / 2)}%.3f  runs ${s.size}")
    }
    FsUtil.deleteRecursively(dst)
    spark.stop()
  }
}
