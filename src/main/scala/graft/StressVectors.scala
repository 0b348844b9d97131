package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the vector/ANN family: N synthetic 64-dim
  * embeddings (default 300k, pass an arg for more — 5–15× the sf0.1
  * bench corpus) through quantization, KMeans, PQ training, corpus
  * encoding, ADC search, and the recall eval, wall times printed per
  * stage. Generation is distributed (`spark.range` + expression-
  * synthesized floats, no driver-side data) and deterministic: vector
  * `id` carries planted cluster `id % 16` as a +8.0 block over dims
  * [4c, 4c+4) on top of hash noise, so the trainers have real
  * structure to find and the ADC search has discriminative codes.
  *
  * Measured (this box, local[8]): 300k → 1M scales near-linearly on
  * every stage (quantize 1.6→2.9 s, KMeans 2.9→7.3 s, PQ train
  * 6.7→20 s, encode 0.11→0.23 s). The ADC stage originally ran as an
  * exploded LUT join + per-pair aggregate (23.5 s at 1M — m rows
  * materialized per candidate); the fused `code_lut_sum` kernel form
  * (m compiled lookups per pair, no explosion, no aggregate) runs the
  * same 16-query search in 9.4 s with a bit-identical result, on par
  * with the codegen'd brute-force dots (6.7–9 s — both are dominated
  * by the 16M-row top-k window at this query count). PQ's 100 TB win
  * remains the 128× storage/bandwidth cut (64×4 B floats → 4 B
  * codes): an in-memory local corpus can't exhibit it.
  *
  * `sbt "runMain graft.StressVectors [vectors]"`.
  */
object StressVectors {
  def main(args: Array[String]): Unit = {
    val vecs = if (args.nonEmpty) args(0).toLong else 300000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress-vec] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
      r
    }

    val corpus = spark.range(vecs).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), d =>
        (when((d / 4).cast("int") === pmod(col("id"), lit(16)), lit(8.0))
          .otherwise(lit(0.0))
          + pmod(col("id") * 31 + d * 7919, lit(97)).cast("double") / 97.0)
          .cast("float")).as("embedding"))
      .localCheckpoint() // materialize once; stages time work, not generation
    println(s"[stress-vec] corpus: ${corpus.count()} vectors x 64 dims")

    timed("int8 quantization (pure projection)") {
      val err = graft.operators.Similarity.quantizeInt8(corpus)
        .agg(max("max_err")).head().getDouble(0)
      println(s"[stress-vec]   max reconstruction err $err")
    }
    timed("KMeans k=16, 2 Lloyd iterations (kernel assign + accumulator barrier)") {
      val cells = graft.operators.Similarity.kmeansTrain(corpus, k = 16, iters = 2)
        .select("cell").distinct().count()
      println(s"[stress-vec]   $cells cells survive")
    }
    val pq = timed("PQ train m=4 x 16 codes, 2 iterations (joint subspace barrier)") {
      graft.operators.Similarity.pqTrain(corpus, m = 4, k = 16, iters = 2, dim = 64)
        .localCheckpoint()
    }
    val books = timed("codebook collect (catalog-sized)") {
      val rows = graft.operators.Similarity.pqCentroidVectors(pq).collect()
      (0 until 4).map { s =>
        rows.toSeq.filter(_.getInt(0) == s).map(r => (r.get(1), r.getSeq[Float](2)))
      }
    }
    timed("PQ encode full corpus (m kernels, zero shuffle)") {
      graft.operators.Similarity.pqEncode(corpus, books, dim = 64).count()
    }
    val queries = corpus.filter(col("vec_id") < 16)
    val adc = timed("ADC top-10, 16 queries x full corpus (fused code_lut_sum kernel)") {
      val r = graft.operators.Similarity.pqAdcTopK(
        corpus, queries, pq, k = 10, m = 4, dim = 64).localCheckpoint()
      println(s"[stress-vec]   ${r.count()} result rows")
      r
    }
    timed("exact brute-force ground truth + recall@10") {
      val exact = graft.operators.Similarity.bruteForceTopK(corpus, queries, k = 10)
      val rec = graft.operators.Similarity.recallAtK(adc, exact)
        .agg(avg("recall")).head().getDouble(0)
      println(f"[stress-vec]   avg recall@10 = $rec%.4f (m=4x16 codes over 64 dims)")
    }
    timed("covariance 64x64 (CenteredUpperProducts kernel, 2080 partial sums)") {
      val n = graft.operators.Similarity.covarianceMatrix(corpus, dim = 64).count()
      println(s"[stress-vec]   $n upper-triangle entries")
    }
    spark.stop()
  }
}
