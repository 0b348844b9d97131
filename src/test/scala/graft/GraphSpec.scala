package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Graph operators: fixed-point PageRank and degree-oriented triangle
  * counting (operators/Graph.scala). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric star concentrates rank on the hub, conserves mass") {
    // Star: hub 0 <-> leaves 1..4, symmetrized.
    val leaves = (1L to 4L)
    val edges = (leaves.map(l => (0L, l)) ++ leaves.map(l => (l, 0L))).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 5)
    // Hub outranks every leaf; leaves are symmetric so identical.
    val leafRanks = leaves.map(out)
    assert(leafRanks.toSet.size === 1)
    assert(out(0L) > leafRanks.head)
    // Mass conservation up to truncation: each node loses < 1 unit per
    // division, two divisions per node per iteration.
    val total = out.values.sum
    assert(total <= Graph.RankOne)
    assert(total > Graph.RankOne - 5 * 2 * 10 - 100)
  }

  test("pageRank: two disconnected symmetric pairs split rank equally") {
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Full symmetry: every node identical, each ~1/4 of the mass.
    assert(out.values.toSet.size === 1)
    assert(math.abs(out(1L) - Graph.RankOne / 4) < 10)
  }

  test("pageRank: dst-only node holds exactly the teleport base") {
    // 1 -> 2 with no out-edge from 2: node 2 receives, node 1 only
    // teleports after iteration 1.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val out = Graph.pageRank(edges, iters = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 15L * Graph.RankOne / (100L * 2)
    assert(out(1L) === base)
    // Node 2: base + 0.85 * floor(prev(1)) where prev(1) = base.
    assert(out(2L) === base + 85L * base / 100L)
  }

  test("pageRank: partition-count invariance (fixed-point arithmetic is order-immune)") {
    val r = new scala.util.Random(7)
    val edges = Seq.fill(300)((r.nextInt(40).toLong, r.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val df1 = edges.toDF("src", "dst").repartition(1)
    val df7 = edges.toDF("src", "dst").repartition(7)
    val a = Graph.pageRank(df1, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRank(df7, iters = 3).collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("triangleCounts: K4 gives every vertex 3 triangles; a path gives none") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("a", "b")
    val out = Graph.triangleCounts(k4).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val p = Graph.triangleCounts(path).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(p === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L))
  }

  test("kCore: peels a tail chain over multiple rounds, keeps the clique") {
    // K4 (1..4) with a path tail 4-5-6-7: at k=2 the tail peels from the
    // far end one vertex per round (3 rounds), the K4 survives intact.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val tail = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (k4 ++ tail).toDF("a", "b")
    val core2 = Graph.kCore(edges, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core2 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // the pure DISTRIBUTED peel (local finish off) must agree exactly
    val dist2 = Graph.kCore(edges, k = 2, localFinishEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist2 === core2)
    // k=4: no vertex has degree 4 — empty core
    assert(Graph.kCore(edges, k = 4).count() === 0)
    assert(Graph.kCore(edges, k = 4, localFinishEdges = 0).count() === 0)
  }

  test("kCore: throws when maxRounds can't reach the fixpoint (both paths)") {
    // a path of 12 vertices at k=2 peels one vertex per end per round
    // (~5 rounds); maxRounds=2 must throw, not return a partial core —
    // on the in-core finish AND the distributed loop alike (the bounded
    // round budget is what makes the unrolled oracle exact)
    val path = (1L to 11L).map(i => (i, i + 1)).toDF("a", "b")
    val ex = intercept[IllegalStateException](Graph.kCore(path, k = 2, maxRounds = 2).count())
    assert(ex.getMessage.contains("did not converge"))
    val exDist = intercept[IllegalStateException](
      Graph.kCore(path, k = 2, maxRounds = 2, localFinishEdges = 0).count())
    assert(exDist.getMessage.contains("did not converge"))
    // with enough rounds it converges to the (empty) 2-core
    assert(Graph.kCore(path, k = 2, maxRounds = 10).count() === 0)
  }

  test("triangleCounts: matches brute-force enumeration on a random graph, input form-invariant") {
    val r = new scala.util.Random(13)
    val raw = Seq.fill(120)((r.nextInt(20).toLong, r.nextInt(20).toLong)).filter(e => e._1 != e._2)
    val und = raw.map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = und.toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val brute = verts.map { v =>
      v -> (for {
        x <- verts; y <- verts
        if x < y && x != v && y != v
        if adj.contains((math.min(v, x), math.max(v, x)))
        if adj.contains((math.min(v, y), math.max(v, y)))
        if adj.contains((x, y))
      } yield 1).size.toLong
    }.toMap
    // Feed the RAW directed multi-list — normalization is the operator's job.
    val out = Graph.triangleCounts(raw.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === brute)
  }

  test("connectedComponents: long path collapses to its minimum in log rounds") {
    // a 64-vertex path has diameter 63 — min-label propagation needs
    // 63 rounds, star contraction must finish far inside 12
    val path = (1L to 63L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // local finish OFF: this pins the distributed log-round contraction
    // itself — diameter 63 must close far inside 12 star rounds
    val got = Graph.connectedComponents(path, maxRounds = 12, localFinishEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 64 && got.values.forall(_ == 1L))
    // default (hybrid): same labels via the in-core union-find finish
    assert(Graph.connectedComponents(path, maxRounds = 12)
      .as[(Long, Long)].collect().toMap === got)
    // two components + messy input (dups, reversed, self-loops)
    val two = Seq((5L, 3L), (3L, 5L), (3L, 4L), (4L, 4L), (10L, 11L), (12L, 11L))
      .toDF("id_a", "id_b")
    val m = Graph.connectedComponents(two).as[(Long, Long)].collect().toMap
    assert(m === Map(3L -> 3L, 4L -> 3L, 5L -> 3L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connectedComponents: agrees with min-label propagation on a random graph") {
    val r = new scala.util.Random(7)
    val raw = Seq.fill(150)((r.nextInt(60).toLong, r.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val df = raw.toDF("id_a", "id_b")
    val star = Graph.connectedComponents(df, localFinishEdges = 0)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    val prop = graft.operators.Dedup.duplicateClusters(df)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(star === prop)
    // the hybrid's union-find finish must agree with both
    val hybrid = Graph.connectedComponents(df)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(hybrid === star)
    // partitioning immunity
    val re = Graph.connectedComponents(df.repartition(13), localFinishEdges = 0)
      .select("id", "cluster").as[(Long, Long)].collect().toMap
    assert(re === star)
  }
}
