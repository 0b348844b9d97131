package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer
object Expl {
  def main(args: Array[String]): Unit = {
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
      s"graft_expl_mirror_${ProcessHandle.current().pid()}")
    graft.operators.Layout.rechunkMirror(spark, "/root/testdata/sf0.1", dst.getPath, Bench.chunkPolicy)
    val dir = dst.getPath
    case class T(stage: Int, launch: Long, run: Long, deser: Long, gc: Long)
    val tasks = ArrayBuffer.empty[T]
    val stages = ArrayBuffer.empty[(Int, Long, Long, Int)] // id, submit, complete, ntasks
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          tasks.synchronized { tasks += T(e.stageId, e.taskInfo.launchTime,
            e.taskMetrics.executorRunTime, e.taskMetrics.executorDeserializeTime,
            e.taskMetrics.jvmGCTime) }
      override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.synchronized { stages += ((e.stageInfo.stageId,
          e.stageInfo.submissionTime.getOrElse(0L),
          e.stageInfo.completionTime.getOrElse(0L), e.stageInfo.numTasks)) }
    })
    val name = args(0)
    SparkEntry.queries(name)(spark, dir).count() // warm
    Thread.sleep(300)
    tasks.clear(); stages.clear()
    val t0 = System.nanoTime()
    SparkEntry.queries(name)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"wall $wall%.3f")
    stages.toSeq.sortBy(_._1).foreach { case (id, s, c, n) =>
      val ts = tasks.filter(_.stage == id)
      println(f"stage $id%3d ntasks $n%3d span ${(c - s) / 1e3}%.3f s  sumRun ${ts.map(_.run).sum / 1e3}%.3f s  maxRun ${if (ts.isEmpty) 0 else ts.map(_.run).max}%d ms  sumDeser ${ts.map(_.deser).sum / 1e3}%.3f s  gc ${ts.map(_.gc).sum}%d ms")
    }
    FsUtil.deleteRecursively(dst)
    spark.stop()
  }
}
