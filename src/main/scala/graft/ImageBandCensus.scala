package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Band-bucket census for the 64-bit Hamming screens (r19, the r18
  * verdict's #4): at 1× and the bench's own 10× construction
  * ([[ScaleUpTables]]), for each banding choice print the (band, key)
  * bucket-size distribution and the candidate-pair mass
  * `Σ n·(n−1)/2` the pigeonhole join would generate — the number that
  * separates "linear corpus, linear candidates" from "clustered
  * fingerprints, quadratic buckets". Run for the image radius
  * (maxHamming 4 ⇒ 5 tight bands) beside the pre-r18 8×8-bit banding,
  * on the image tier (renderPng → imageDHash) and, with
  * SPARK_GRAFT_CENSUS_VIDEO=1, the video tier.
  *
  * Usage: sbt "runMain graft.ImageBandCensus [sfdir]"
  * Never writes artifact files — evidence goes to OPTIMIZATION_r19.md.
  */
object ImageBandCensus {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pid = ProcessHandle.current().pid()
    val upDir = s"${sys.props("java.io.tmpdir")}/graft_census_10x_$pid"
    try {
      ScaleUpTables.build10x(spark, sfDir, upDir)
      def fps(dir: String): DataFrame = {
        val ids = spark.read.parquet(s"$dir/documents.parquet").select("doc_id")
        val f =
          if (sys.env.get("SPARK_GRAFT_CENSUS_VIDEO").contains("1"))
            graft.operators.Multimodal.videoDHash(
              graft.operators.Multimodal.renderGif(ids, 16, 16, nFrames = 8,
                idCol = "doc_id"), stride = 2)
          else graft.operators.Multimodal.imageDHash(
            graft.operators.Multimodal.renderPng(ids, 32, 32, idCol = "doc_id"))
        f.localCheckpoint() // hash once, census twice
      }
      def census(f: DataFrame, nBands: Int, label: String): Unit = {
        val sizes = f
          .select(explode(graft.operators.Dedup.bandKeys64(
            col("dhash_hi").cast("long")
              .bitwiseOR(shiftleft(col("dhash_lo").cast("long"), 32)),
            nBands)).as("bk"))
          .groupBy(col("bk.band"), col("bk.key"))
          .agg(count(lit(1)).as("n"))
        val agg = sizes.agg(
          count(lit(1)).as("buckets"),
          max(col("n")).as("max_bucket"),
          sum(col("n") * (col("n") - 1) / 2).as("cand_pairs")).head()
        println(f"$label%-28s buckets=${agg.getLong(0)}%-8d " +
          f"max=${agg.getLong(1)}%-7d candPairs=${agg.getDouble(2).toLong}")
      }
      for ((dir, tag) <- Seq((sfDir, "1x"), (upDir, "10x"))) {
        val f = fps(dir)
        census(f, 5, s"$tag tight 5-band (radius 4)")
        census(f, 8, s"$tag byte 8-band (pre-r18)")
      }
    } finally {
      FsUtil.deleteRecursively(new java.io.File(upDir))
      spark.stop()
    }
  }
}
