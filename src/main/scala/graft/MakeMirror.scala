package graft

import org.apache.spark.sql.SparkSession

/** Layout-parity tool: materialize the EXACT re-chunked parquet mirror
  * the bench measures ([[graft.operators.Layout.rechunkMirror]] under
  * [[Bench.chunkPolicy]]) at a caller-chosen path, so the DuckDB
  * anchor (tools/bench_baseline.py) can be regenerated against the
  * SAME layout Spark reads — both engines' parquet scan parallelism is
  * row-group-granular, so an anchor timed on the raw single-row-group
  * testdata and a bench timed on the mirror would compare layouts, not
  * engines.
  *
  * Usage: runMain graft.MakeMirror <srcDir> <dstDir>
  */
object MakeMirror {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MakeMirror <srcDir> <dstDir>")
    val Array(src, dst) = args
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.operators.Layout.rechunkMirror(spark, src, dst, Bench.chunkPolicy)
    println(f"mirrored $src -> $dst in ${(System.nanoTime() - t0) / 1e9}%.2f s " +
      s"(policy: ${Bench.chunkPolicyDesc})")
    spark.stop()
  }
}
