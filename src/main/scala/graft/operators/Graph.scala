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
    *
    * Hybrid tail: when the surviving edge frame fits
    * `localFinishEdges` (collected rows on the driver), the remaining
    * rounds run as an in-core loop under the SAME round budget —
    * peeling shrinks the frame monotonically, so distribution pays on
    * the early frame and the tail stops burning a scheduling-floor
    * job pair per degree level. 0 disables (pure distributed loop).
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30,
      aCol: String = "a", bCol: String = "b",
      localFinishEdges: Long = 1L << 18): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    var e = edges.select(
        least(col(aCol), col(bCol)).cast("long").as("a"),
        greatest(col(aCol), col(bCol)).cast("long").as("b"))
      .filter(col("a") < col("b")).distinct().localCheckpoint()
    // One whole peel as a PLAN, not an action: the low frontier rides
    // into both anti-joins inside the same job. NOT broadcast-hinted:
    // the frontier is peel-depth-bounded only AFTER the first round —
    // round one's low set is every vertex under degree k, which for
    // k above the typical degree is O(V) and would OOM a forced
    // broadcast. Under static planning the un-hinted anti-joins run
    // sort-merge (scale-safe at any frontier size); cluster sessions
    // run AQE, which converts the post-first-round frontiers to
    // broadcasts at runtime from their REAL sizes.
    def peel(cur: DataFrame): DataFrame = {
      val low = cur.select(col("a").as("id")).union(cur.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("id"))
      cur.join(low.select(col("id").as("__low_a")),
          col("a") === col("__low_a"), "left_anti")
        .join(low.select(col("id").as("__low_b")),
          col("b") === col("__low_b"), "left_anti")
    }
    // Convergence by edge count, exactly: a peeled vertex appears in
    // ≥ 1 surviving edge by definition (deg ≥ 1 > 0), so the peel
    // removed a vertex iff it removed an edge — count unchanged ⟺
    // the low set was empty ⟺ fixpoint. That makes each round TWO
    // jobs (materialize + count over the materialized blocks) instead
    // of the low-checkpoint / isEmpty / e-checkpoint triple, with the
    // same exactness.
    var eCount = e.count()
    var converged = false
    var round = 0
    var localResult: Option[DataFrame] = None
    while (!converged && round < maxRounds && localResult.isEmpty) {
      if (eCount <= localFinishEdges && localFinishEdges > 0) {
        // In-core finish — same hybrid as [[connectedComponents]]: the
        // surviving frame fits the driver, so the remaining peel rounds
        // (each a scheduling-floor-bound job pair) run as an in-memory
        // loop. The round budget STAYS in force: the `maxRounds`-
        // unrolled relational oracle is exact only because the operator
        // refuses to out-converge it, so the local loop throws past the
        // same bound the distributed loop would.
        var cur = e.select(col("a"), col("b")).collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        var stable = false
        while (!stable && round < maxRounds) {
          val deg = scala.collection.mutable.LongMap.empty[Int]
          cur.foreach { case (a, b) =>
            deg(a) = deg.getOrElse(a, 0) + 1; deg(b) = deg.getOrElse(b, 0) + 1
          }
          val nxt = cur.filter { case (a, b) => deg(a) >= k && deg(b) >= k }
          if (nxt.length == cur.length) stable = true
          else { cur = nxt; round += 1 }
        }
        if (!stable)
          throw new IllegalStateException(
            s"k-core peeling did not converge in $maxRounds rounds (k=$k); raise maxRounds")
        val spark = edges.sparkSession
        import spark.implicits._
        val degs = {
          val m = scala.collection.mutable.LongMap.empty[Long]
          cur.foreach { case (a, b) =>
            m(a) = m.getOrElse(a, 0L) + 1L; m(b) = m.getOrElse(b, 0L) + 1L
          }
          m.toSeq
        }
        localResult = Some(degs.toDF("id", "deg"))
        converged = true
      } else {
        val e2 = peel(e).localCheckpoint()
        val c2 = e2.count()
        if (c2 == eCount) converged = true
        else { e = e2; eCount = c2; round += 1 }
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"k-core peeling did not converge in $maxRounds rounds (k=$k); raise maxRounds")
    localResult.getOrElse(
      e.select(col("a").as("id")).union(e.select(col("b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg")))
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
    * produce, so all three agree row-for-row. Distributed rounds past
    * `maxRounds` throw (the [[kCore]] discipline) — though the hybrid
    * tail below may close the fixpoint where the pure loop would have
    * thrown; see its note for why that cannot change a row.
    *
    * Output: (id, cluster) for every edge endpoint, cluster = the
    * component's minimum node id.
    *
    * Hybrid tail: star contraction shrinks the edge frame
    * geometrically, so once it fits `localFinishEdges` the fixpoint
    * closes with one bounded collect + min-id union-find (exact: every
    * round's frame spans the same node partition as the input) instead
    * of two floor-bound jobs per remaining halving. 0 disables.
    *
    * The local finish closes the fixpoint UNCONDITIONALLY — it may
    * out-converge a round budget the distributed loop would have blown
    * (a call that throws at `localFinishEdges = 0` can succeed at the
    * default). That asymmetry is deliberate and sound for CC, unlike
    * [[kCore]]'s tail, which keeps the budget: CC's answer is the
    * unique min-id component labeling, independent of how many rounds
    * reached it, so out-converging cannot change a row — whereas
    * kCore's `maxRounds`-unrolled relational oracle is exact only
    * because the operator refuses to peel past the same bound. Here
    * `maxRounds` bounds the DISTRIBUTED spend (the resource guard),
    * not the result. */
  def connectedComponents(pairs: DataFrame, maxRounds: Int = 25,
      aCol: String = "id_a", bCol: String = "id_b",
      localFinishEdges: Long = 1L << 18): DataFrame = {
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

    // In-core finish: once the contracting frame fits `localFinishEdges`,
    // a driver-side union-find closes the fixpoint in O(m α) instead of
    // O(log n) more two-job rounds. Contraction shrinks the frame
    // geometrically, so at any input scale the loop spends its rounds
    // where distribution pays (the TB-sized early frame) and the tail —
    // which would otherwise burn a scheduling-floor-bound round per
    // remaining halving — collapses into one bounded collect. The
    // invariant making this exact: every round's edge set spans the
    // SAME node partition as the input (each non-root node persists as
    // a `b` endpoint through both stars), so min-id components of the
    // current frame ARE the final labels. localFinishEdges = 0 forces
    // the pure distributed fixpoint (what the spec pins).
    def localFinish(edges: Array[(Long, Long)]): DataFrame = {
      // LongMap: unboxed keys — the collected frame is threshold-bounded
      // (default 2^18 edges), and the union-find over it must not
      // balloon into boxed-entry heap on a default-sized driver
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { // union by MIN id — the label IS the root
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val labels = edges.iterator.flatMap { case (a, b) => Iterator(a, b) }
        .toArray.distinct.map(id => (id, find(id)))
      val spark = pairs.sparkSession
      import spark.implicits._
      labels.toSeq.toDF("id", "cluster")
    }

    var converged = false
    var round = 0
    var labelled: Option[DataFrame] = None
    // the count actions exist only to steer the local finish; the pure
    // distributed fixpoint (localFinishEdges = 0) never pays them
    var eCount = if (localFinishEdges > 0) e.count() else Long.MaxValue
    while (!converged && round < maxRounds) {
      if (eCount <= localFinishEdges && localFinishEdges > 0) {
        labelled = Some(localFinish(e.select(col("a"), col("b"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))))
        converged = true
      } else {
        val next = smallStar(largeStar(e)).localCheckpoint()
        // exact fixpoint test in ONE action: both distinct sets are equal
        // iff their symmetric difference is empty (both except branches
        // evaluate inside one plan)
        converged = next.except(e).union(e.except(next)).isEmpty
        e = next
        eCount =
          if (converged || localFinishEdges == 0) eCount else e.count()
        round += 1
      }
    }
    if (!converged)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxRounds rounds; raise maxRounds")
    val labelEdges = labelled.getOrElse(
      e.select(col("b").as("id"), col("a").as("cluster")))
    nodes
      .join(labelEdges.select(col("id"), col("cluster")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }
}
