package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over relation-derived edge lists — the iterative
  * (PageRank) and join-shaped (triangle counting) complements to the
  * min-label connected components in [[Dedup.duplicateClusters]].
  *
  * A 100 TB corpus's graph problems (domain authority over a link
  * graph, co-occurrence cliques, dedup-cluster structure) all reduce to
  * these shapes: a per-iteration join+aggregate keyed by vertex, or a
  * degree-bounded wedge join. Everything here is DataFrame-first: edges
  * are rows, iterations are jobs, and no adjacency structure ever
  * materializes on the driver.
  */
object Graph {

  /** Fixed-point micro-unit scale for PageRank mass: 1 rank = 10^12
    * units. All iteration arithmetic is LONG integer — sums are
    * order-invariant and division truncates identically on every
    * engine, so the whole iteration chain is bit-portable (the same
    * discipline as [[graft.functions.CodeLutSum]]'s micro-unit
    * accumulation). Double-precision PageRank would hash-diverge across
    * engines on accumulation order alone.
    */
  val RankOne: Long = 1000000000000L

  /** PageRank over a directed edge list, `iters` synchronous iterations
    * from a uniform start:
    *
    * {{{  r'(v) = (1-d)/N + d * Σ_{u→v} floor(r(u) / outdeg(u))  }}}
    *
    * with d = `dampNum`/`dampDen` (default 85/100) and every quantity
    * in [[RankOne]] micro-units of LONG — see the scale note above.
    * Nodes are the union of both edge endpoints; a node with no
    * in-edges holds the teleport base, a node with no out-edges leaks
    * its mass (the classic simplification — symmetrize the edge list or
    * add self-loops upstream when dangling mass matters, as the
    * bipartite query in SparkEntry does).
    *
    * Scale shape: the edge frame (src, dst, outdeg) is computed once
    * and checkpoint-pinned; each iteration is ONE equi-join on src +
    * ONE groupBy(dst) sum + a node-frame left join for teleport-only
    * nodes — all keyed by vertex id, so 100 TB of edges spread across
    * the shuffle with no driver state. On a real cluster, bucket the
    * edge table by `src` and the per-iteration join side of the shuffle
    * disappears; the rank frame (node-sized, two longs) is the only
    * per-round exchange. The rank chain checkpoints every FIFTH
    * iteration (lineage depth ≤ 5 is harmless, and an un-checkpointed
    * tail runs as one plan with the adj-side exchange reused — the
    * per-iteration materialization actions this replaced were a third
    * of the sf0.1 wall at iters = 3); long loops still can't compound
    * lineage, the [[Dedup.duplicateClusters]] discipline.
    *
    * Output: (id, rank_units LONG, rank DOUBLE = units / 10^12). Total
    * mass is conserved up to truncation (each node's division and the
    * damping division each truncate < 1 unit = 10^-12).
    */
  def pageRank(edges: DataFrame, iters: Int,
      dampNum: Long = 85L, dampDen: Long = 100L,
      srcCol: String = "src", dstCol: String = "dst",
      assumeDistinct: Boolean = false): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum >= 0 && dampNum <= dampDen, "damping must be in [0, 1]")
    // `assumeDistinct` skips the defensive dedup exchange when the
    // caller's construction is distinct BY SHAPE (e.g. the symmetric
    // union of an already-distinct bipartite frame over disjoint id
    // ranges) — on a 100 TB edge list that exchange is pure waste.
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val e = if (assumeDistinct) e0 else e0.distinct()
    // outdeg rides a count-over-partition window: ONE exchange on src
    // produces the degree-annotated edge list directly (a groupBy +
    // join-back shuffles the stream twice) AND leaves adj clustered by
    // src — exactly the layout every iteration's contribution join
    // wants. adj pins the (possibly expensive) upstream edge
    // construction ONCE; nodes derives from the materialized adj, not
    // from a second run of the edge build.
    val adj = e.withColumn("outdeg",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint()
    val nodes = adj.select(col("src").as("id"))
      .union(adj.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = nodes.count()
    val base = (dampDen - dampNum) * RankOne / (dampDen * n)
    var ranks = nodes.withColumn("rank_units", lit(RankOne / n))
    for (it <- 1 to iters) {
      // `div` = exact LONG integer division: `/` would detour through
      // DOUBLE, where a near-integer quotient can round across the
      // floor boundary — the whole point of fixed-point is to avoid it.
      val contrib = adj.join(ranks, adj("src") === ranks("id"))
        .select(col("dst"), expr("rank_units div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("in_mass"))
      ranks = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (lit(base) + expr(s"($dampNum * coalesce(in_mass, 0L)) div $dampDen"))
            .cast("long").as("rank_units"))
      // Checkpoint every 5th iteration, not every one: lineage depth 5
      // is harmless, and an un-checkpointed tail lets the final action
      // run the remaining iterations as ONE plan in which ReuseExchange
      // shares the adj-side shuffle — per-iteration materialization
      // actions (node-frame writes + their scheduling floor) were a
      // third of the sf0.1 wall at iters = 3.
      if (it % 5 == 0 && it < iters) ranks = ranks.localCheckpoint()
    }
    ranks.withColumn("rank", round(col("rank_units") / lit(RankOne.toDouble), 12))
  }

  /** Exact triangle count per vertex over an undirected edge list.
    *
    * Degree-ordered orientation (the classic O(m^1.5) bound): each
    * undirected edge points from its lower-(degree, id) endpoint to the
    * higher one, so every vertex's out-degree is O(√m) regardless of
    * how skewed the raw degree distribution is — the wedge join emits
    * Σ outdeg² = O(m^1.5) rows instead of the Σ deg² a hub vertex would
    * cost under arbitrary orientation. Each triangle then has exactly
    * one vertex with two out-edges (its order-minimum), so triangles =
    * wedges (u→v, u→w with v before w) semi-joined against the oriented
    * closing edge (v→w); no triangle is counted twice and none is
    * missed.
    *
    * Three shuffles total (degree agg, wedge join on the apex, closing
    * semi-join on the wedge endpoints) — all keyed by vertex/edge, no
    * driver state, no iteration. Input edges are normalized (a < b,
    * distinct) first, so callers can pass raw symmetric or multi-edge
    * lists.
    *
    * Output: (id, triangles LONG) for every vertex of the normalized
    * graph, including zero rows — per-vertex triangle participation,
    * the local-clustering numerator.
    */
  def triangleCounts(edges: DataFrame,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    val und = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct()
    val deg = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // Orient by (deg, id): lower endpoint → higher endpoint.
    val oriented = und
      .join(deg.select(col("id").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("deg_b")), "b")
      .select(
        when(col("deg_a") < col("deg_b") ||
             (col("deg_a") === col("deg_b") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(col("deg_a") < col("deg_b") ||
             (col("deg_a") === col("deg_b") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("v"))
      .localCheckpoint()
    // Wedges at apex u: unordered out-neighbor pairs, canonicalized so
    // the closing lookup probes each undirected edge in ONE direction.
    val w1 = oriented.select(col("u"), col("v").as("x"))
    val w2 = oriented.select(col("u"), col("v").as("y"))
    val wedges = w1.join(w2, "u").filter(col("x") < col("y"))
    val closing = oriented.select(
      least(col("u"), col("v")).as("x"), greatest(col("u"), col("v")).as("y"))
    val tris = wedges.join(closing, Seq("x", "y"), "left_semi")
      .select(col("u"), col("x"), col("y"))
    val perVertex = tris.select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
    deg.select(col("id")).join(perVertex, Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** k-core of an undirected edge list: iteratively peel every vertex
    * with degree < k until none remain — the standard "dense enough to
    * matter" subgraph extraction (spam-farm detection on link graphs,
    * cluster-nucleus selection on co-occurrence graphs).
    *
    * Synchronous peeling: each round computes degrees (one agg over the
    * surviving edges) and anti-joins the low-degree vertex list out of
    * both endpoints. The low list SHRINKS every round and is usually a
    * small fraction of vertices, so the anti-join broadcasts; the edge
    * frame only ever decreases. Rounds localCheckpoint (the
    * [[Dedup.duplicateClusters]] loop discipline) and converge in
    * O(peel depth) — star-like graphs peel in a few rounds; an
    * adversarial path graph needs O(n). THROWS if `maxRounds` rounds
    * don't reach the fixpoint rather than returning a partial core —
    * which also makes a `maxRounds`-unrolled relational replay exact by
    * construction (extra replay rounds past convergence are no-ops).
    *
    * Input edges are normalized (a < b, distinct) first. Output:
    * (id, deg) — every vertex of the k-core with its degree INSIDE the
    * core (≥ k by definition; empty when no k-core exists).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30,
      aCol: String = "a", bCol: String = "b"): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    var e = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    def degrees = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val low = degrees.filter(col("deg") < k).select(col("id")).localCheckpoint()
      if (low.isEmpty) converged = true
      else {
        val lowA = low.select(col("id").as("__low_a"))
        val lowB = low.select(col("id").as("__low_b"))
        e = e.join(lowA, col("a") === col("__low_a"), "left_anti")
          .join(lowB, col("b") === col("__low_b"), "left_anti")
          .localCheckpoint()
        round += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peeling did not converge in $maxRounds rounds (k=$k); raise maxRounds")
    degrees
  }

  /** Connected components in O(log n) rounds: alternating
    * large-star / small-star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14).
    *
    * [[Dedup.duplicateClusters]]' min-label propagation needs one round
    * per graph DIAMETER — fine for near-dup clusters (tiny diameters),
    * fatal for the long-path components a web-crawl link graph or a
    * citation chain produces at 100 TB. Star contraction's round count
    * is logarithmic in the component size regardless of diameter:
    *
    *  - large-star (per node u): every neighbor v > u re-attaches to
    *    m = min(Γ(u) ∪ u) — one groupBy(u) for m plus one co-keyed
    *    join back to the adjacency;
    *  - small-star (per node u over the larger→smaller orientation):
    *    every neighbor v ≤ u and u itself re-attach to the minimum —
    *    same two-exchange shape.
    *
    * Both emit canonical (small, large) edges, so every round is four
    * vertex-keyed exchanges with no driver state. Convergence is
    * checked EXACTLY (count equality + `except` emptiness — two
    * bounded jobs per round, not a hash heuristic); the fixpoint is a
    * star forest rooted at each component's minimum id, which is the
    * same labeling the recursive-CTE oracle and min-label propagation
    * produce, so all three agree row-for-row. Rounds past `maxRounds`
    * throw — the bounded-unroll discipline of [[kCore]].
    *
    * Output: (id, cluster) for every edge endpoint, cluster = the
    * component's minimum node id. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    require(maxRounds >= 1, "maxRounds must be >= 1")
    var e = pairs
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("a").as("id")).union(e.select(col("b").as("id")))
      .distinct().localCheckpoint()

    // large-star: m ≤ u < v strictly, so (m, v) is canonical already.
    def largeStar(edges: DataFrame): DataFrame = {
      val sym = edges.select(col("a").as("u"), col("b").as("v"))
        .union(edges.select(col("b").as("u"), col("a").as("v")))
      val mins = sym.groupBy("u").agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("u"), col("__mn")).as("__m"))
      sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("__m").as("a"), col("v").as("b"))
        .distinct()
    }

    // small-star over the larger→smaller orientation: neighbors v ≠ m
    // re-attach to m, and u itself does too (m < v < u and m < u, so
    // both emissions are canonical).
    def smallStar(edges: DataFrame): DataFrame = {
      val pt = edges.select(col("b").as("u"), col("a").as("v"))
      val mins = pt.groupBy("u").agg(min(col("v")).as("__m"))
      pt.join(mins, "u").filter(col("v") =!= col("__m"))
        .select(col("__m").as("a"), col("v").as("b"))
        .union(mins.select(col("__m").as("a"), col("u").as("b")))
        .distinct()
    }

    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      // exact fixpoint test in ONE action: both distinct sets are equal
      // iff their symmetric difference is empty (both except branches
      // evaluate inside one plan)
      converged = next.except(e).union(e.except(next)).isEmpty
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxRounds rounds; raise maxRounds")
    nodes
      .join(e.select(col("b").as("id"), col("a").as("cluster")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }
}
