package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
object ZProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var report = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (report) {
        val si = sc.stageInfo
        if (si.taskMetrics.executorRunTime > 25)
          println(f"  stage id=${si.stageId} tasks=${si.numTasks} runTime=${si.taskMetrics.executorRunTime}ms cpu=${si.taskMetrics.executorCpuTime/1000000}ms")
      }
    })
    val dir = "/root/testdata/sf0.1"
    for (q <- sys.env.getOrElse("Q", "rel_join_agg").split(",")) {
      def once(): Double = { val t0=System.nanoTime(); SparkEntry.queries(q)(spark, dir).count(); (System.nanoTime()-t0)/1e9 }
      once(); once()
      report = true
      println(s"=== $q")
      val t = once()
      println(f"WALL $t%.3f s")
      report = false
    }
    spark.stop()
  }
}
