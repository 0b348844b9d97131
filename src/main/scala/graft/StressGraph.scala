package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics stress: the four graph operators on
  * synthetically-generated skewed edge lists two orders of magnitude
  * beyond the bench graphs (which top out at ~60 k edges at sf0.1) —
  * the at-scale proof that the shapes chosen for their 100 TB
  * narratives (log-rounds star contraction, degree-ordered wedges,
  * broadcast peel, checkpoint-pinned rank loop) actually carry real
  * volume. Generation is distributed and DETERMINISTIC (hash-based
  * inverse-transform skew, no RNG), so runs are comparable.
  *
  * `sbt "runMain graft.StressGraph [nEdges]"` (default 5 M).
  */
object StressGraph {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.nonEmpty) args(0).toLong else 5000000L
    val nNodes = nEdges / 5 // avg degree ~10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress-graph] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
      r
    }

    // Skewed endpoints by inverse transform over a hash-uniform u:
    // id -> u = (h % 1e6)/1e6, endpoint = floor(n * u^3) — a hub-heavy
    // degree distribution (the shape that breaks naive wedge joins).
    def endpoint(seed: Column, n: Long): Column = {
      val u = pmod(xxhash64(seed), lit(1000000L)).cast("double") / 1e6
      least(lit(n - 1), floor(pow(u, 3.0) * n).cast("long"))
    }
    val edges = spark.range(nEdges)
      .select(endpoint(concat(lit("a"), col("id")), nNodes).as("a"),
        endpoint(concat(lit("b"), col("id")), nNodes).as("b"))
      .filter(col("a") =!= col("b"))
      .localCheckpoint()
    val m = edges.count()
    println(s"[stress-graph] $m skewed edges over $nNodes nodes " +
      s"(max degree ${edges.select(col("a").as("id")).union(edges.select(col("b").as("id")))
        .groupBy("id").count().agg(max("count")).head().getLong(0)})")

    timed(s"pageRank, 5 iterations (fixed-point LONG)") {
      val pr = graft.operators.Graph.pageRank(
        edges.select(col("a").as("src"), col("b").as("dst")), iters = 5)
      println(s"[stress-graph]   ${pr.count()} ranked nodes, " +
        s"top mass ${pr.agg(max("rank")).head().getDouble(0)}")
    }
    timed("kCore k=4 (synchronous peel)") {
      val core = graft.operators.Graph.kCore(edges, k = 4, maxRounds = 40)
      println(s"[stress-graph]   ${core.count()} vertices in the 4-core")
    }
    timed("triangleCounts (degree-ordered wedges) on a 1M-edge slice") {
      val slice = edges.limit(1000000)
      val tri = graft.operators.Graph.triangleCounts(slice)
      println(s"[stress-graph]   ${tri.agg(sum("triangles")).head().getLong(0)} " +
        "triangle participations")
    }
    timed("connectedComponents (log-rounds star contraction) on a 2M-edge slice") {
      // planted islands: shift 1% of edges into a disjoint id range so
      // the fixpoint has real multi-component structure to find
      val slice = edges.limit(2000000)
        .withColumn("shift",
          when(pmod(col("a") + col("b"), lit(100)) === 0, lit(10L * nNodes))
            .otherwise(lit(0L)))
        .select((col("a") + col("shift")).as("id_a"),
          (col("b") + col("shift")).as("id_b"))
      val cc = graft.operators.Graph.connectedComponents(slice, maxRounds = 30)
      println(s"[stress-graph]   ${cc.select("cluster").distinct().count()} components " +
        s"over ${cc.count()} labeled vertices")
      // hybrid ≡ pure-distributed AT SCALE: the default run above
      // contracts until the frame fits the in-core threshold and
      // finishes with the union-find; the localFinishEdges = 0 run
      // drives the star contraction to its distributed fixpoint. The
      // two labelings must agree row-for-row — the at-volume version
      // of GraphSpec's equality pin.
      val ccDist = timed("  pure-distributed fixpoint (localFinishEdges = 0)") {
        graft.operators.Graph.connectedComponents(slice, maxRounds = 30,
          localFinishEdges = 0).localCheckpoint()
      }
      // full-outer on id: a vertex missing from EITHER labeling counts
      // as a disagreement (an inner join would hide dropped rows)
      val diff = cc.withColumnRenamed("cluster", "c1")
        .join(ccDist.withColumnRenamed("cluster", "c2"), Seq("id"), "full_outer")
        .filter(col("c1").isNull || col("c2").isNull || col("c1") =!= col("c2"))
        .count()
      require(diff == 0, s"hybrid and distributed CC disagree on $diff vertices")
      println(s"[stress-graph]   hybrid ≡ distributed on all ${ccDist.count()} labels")
    }
    spark.stop()
  }
}
