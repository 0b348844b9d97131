package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Isolated A/B for the tombstone-screen shape choice (r19, the r18
  * verdict's "size `delPushdownMax` from data"): NOT-IN collect+push
  * vs distributed anti-join on the SAME 10× IVF store
  * ([[ScaleUpTables]] — the bench's own scale-up construction) at del
  * list sizes 1k/4k/16k/32k. 64k is not measurable at this corpus
  * size (the 10× sf0.1 store holds 50k vectors); the trend across the
  * measured span plus the driver-exposure argument set the default.
  *
  * Both variants are the PRODUCTION paths of
  * [[graft.operators.Similarity.ivfProbeTopKPruned]]: `maxDel` high
  * enough to collect (the fold + `Not(In(...))` screen) vs
  * `delPushdownMax = 0` (the fold declines, the serve anti-joins the
  * tombstone tree distributed). Interleaved rounds in ONE session per
  * the AbBench discipline; value equality collect-compared per size.
  *
  * Usage: sbt "runMain graft.DelPushdownAb [sfdir]"
  * Never writes artifact files — evidence goes to OPTIMIZATION_r19.md.
  */
object DelPushdownAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "7").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "4194304"))
      .config("spark.sql.files.openCostInBytes", "1048576")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pid = ProcessHandle.current().pid()
    val tmp = sys.props("java.io.tmpdir")
    val upDir = s"$tmp/graft_delab_10x_$pid"
    val storeDir = s"$tmp/graft_delab_store_$pid"
    try {
      ScaleUpTables.build10x(spark, sfDir, upDir)
      val emb = spark.read.parquet(s"$upDir/embeddings.parquet")
      val nVec = emb.count()
      println(s"corpus: $nVec vectors")
      val cents = graft.operators.Similarity.cellCentroids(emb)
        .localCheckpoint()
      graft.operators.Similarity.ivfAppend(emb, cents, s"$storeDir/corpus", batchId = 0L)
      val stored = spark.read.parquet(s"$storeDir/corpus")
      val queries = emb.filter(col("vec_id") < 8).select("vec_id", "embedding")
        .localCheckpoint()

      // allow deep deletion fractions: a mostly-deleted window between
      // compactions is precisely the delete-heavy case the shapes
      // diverge on (64k exceeds this corpus entirely; reported as such)
      val sizes = Seq(1000, 4000, 16000, 32000, 64000).filter(_ <= nVec * 4 / 5)
      // per-size tombstone trees, written exactly as ivfDelete lays
      // them out (id column + batch_id partition), ids disjoint from
      // the query ids
      val delDfs = sizes.map { n =>
        val path = s"$storeDir/del_$n"
        spark.range(100, 100 + n).select(col("id").as("vec_id"))
          .withColumn("batch_id", lit(1L))
          .write.mode("overwrite").partitionBy("batch_id").parquet(path)
        n -> spark.read.parquet(path)
      }.toMap

      def serve(n: Int, pushdown: Boolean) =
        graft.operators.Similarity.ivfProbeTopKPruned(
          stored, queries, cents, k = 5, nprobe = 2, cellCol = "cell",
          delOpt = Some(delDfs(n)),
          delPushdownMax = if (pushdown) 1 << 20 else 0)

      // value equality once per size (sorted collect compare)
      sizes.foreach { n =>
        val a = serve(n, pushdown = true).orderBy("query_id", "rank").collect().toSeq
        val b = serve(n, pushdown = false).orderBy("query_id", "rank").collect().toSeq
        require(a == b && a.nonEmpty, s"pushdown != anti-join at n=$n")
        println(s"n=$n: values equal (${a.size} rows)")
      }

      // interleaved timing: (size, variant) round-robin
      val keys = for (n <- sizes; p <- Seq(true, false)) yield (n, p)
      def once(k: (Int, Boolean)): Double = {
        val t0 = System.nanoTime()
        serve(k._1, k._2).count()
        (System.nanoTime() - t0) / 1e9
      }
      keys.foreach(once) // warm
      val samples = keys.map(_ -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
      for (_ <- 1 to rounds; k <- keys) samples(k) += once(k)
      for (n <- sizes) {
        def stat(p: Boolean) = {
          val s = samples((n, p)).sorted
          f"min ${s.head}%.3f med ${s(s.size / 2)}%.3f"
        }
        println(f"n=$n%-6d  pushdown ${stat(true)}   anti-join ${stat(false)}")
      }
    } finally {
      FsUtil.deleteRecursively(new java.io.File(upDir))
      FsUtil.deleteRecursively(new java.io.File(storeDir))
      spark.stop()
    }
  }
}
