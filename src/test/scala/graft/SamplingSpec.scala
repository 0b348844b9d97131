package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Similarity}

/** Deterministic sampling, centroid training, and the SQL view surface. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 200L).map(i => (i, if (i % 2 == 0) "en" else "de"))
    .toDF("doc_id", "lang")

  test("stratified sampling is deterministic and respects per-stratum rates") {
    val a = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 10, "de" -> 50))
    val b = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 10, "de" -> 50))
    assert(a.collect().toSeq == b.collect().toSeq) // pure function of ids
    val byLang = a.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 100 docs per stratum; hash buckets approximate the rate
    assert(byLang.getOrElse("en", 0L) < byLang("de"))
    // default rate 0 ⇒ unlisted strata drop out entirely
    val onlyEn = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 100))
    assert(onlyEn.select("lang").distinct().as[String].collect().toSeq == Seq("en"))
  }

  test("samplePerGroup yields exactly min(k, group size), stable under growth") {
    val got = Sampling.samplePerGroup(docs, "doc_id", "lang", k = 30)
    val sizes = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("en" -> 30L, "de" -> 30L))
    // a group smaller than k yields the whole group
    val tiny = docs.filter(col("doc_id") < 5)
    val all = Sampling.samplePerGroup(tiny, "doc_id", "lang", k = 30)
    assert(all.count() == 5)
    // ranks are 1..k with no gaps and the winner set is a pure function
    // of the ids: adding an unrelated group never changes existing picks
    val en = got.filter(col("lang") === "en")
      .select("doc_id").as[Long].collect().toSet
    val grown = docs.union(Seq((900L, "zh"), (901L, "zh")).toDF("doc_id", "lang"))
    val regrown = Sampling.samplePerGroup(grown, "doc_id", "lang", k = 30)
      .filter(col("lang") === "en").select("doc_id").as[Long].collect().toSet
    assert(regrown == en)
    val ranks = got.filter(col("lang") === "de")
      .select("sample_rank").as[Int].collect().sorted.toSeq
    assert(ranks == (1 to 30))
  }

  test("trainTestSplit is disjoint and covers the input, including null ids") {
    val (train, test) = Sampling.trainTestSplit(docs, "doc_id", testPct = 20)
    assert(train.count() + test.count() == 200)
    assert(train.join(test, "doc_id").count() == 0)
    // a null id must land in exactly one split, not vanish from both
    val withNull = Seq(Option(1L), Option(2L), Option.empty[Long]).toDF("doc_id")
    val (tr, te) = Sampling.trainTestSplit(withNull, "doc_id", testPct = 50)
    assert(tr.count() + te.count() == 3)
  }

  test("mixToProportions hits the target mix without up-sampling") {
    // 300 en / 100 de: target 50/50 → de is binding (keeps 100%), en
    // keeps ~1/3. Deterministic: same call twice → same rows.
    val skewed = ((0L until 300L).map(i => (i, "en")) ++ (300L until 400L).map(i => (i, "de")))
      .toDF("doc_id", "lang")
    val got = Sampling.mixToProportions(skewed, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 100L) // binding stratum keeps everything
    assert(math.abs(byLang("en") - 100L) <= 15L) // hash bucket ≈ 1/3 of 300
    val again = Sampling.mixToProportions(skewed, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5))
    assert(got.collect().toSeq == again.collect().toSeq)
    // absent / zero-target strata drop out
    val dropped = Sampling.mixToProportions(skewed, "doc_id", "lang", Map("de" -> 1.0))
    assert(dropped.select("lang").distinct().as[String].collect().toSeq == Seq("de"))
    intercept[IllegalArgumentException] {
      Sampling.mixToProportions(skewed, "doc_id", "lang", Map("zz" -> 1.0))
    }
  }

  test("sampleWeighted favors heavy rows, excludes non-positive weights") {
    // weight 1000 vs 1: u^(1/1000) ≈ 1 while u^(1/1) = u — every heavy
    // row out-ranks every light row whose u isn't extreme; with 20
    // heavy rows and k = 10, all winners should be heavy.
    val weighted = ((0L until 20L).map(i => (i, 1000.0)) ++
      (20L until 200L).map(i => (i, 1.0))).toDF("doc_id", "w")
    val got = Sampling.sampleWeighted(weighted, "doc_id", "w", k = 10)
    assert(got.count() == 10)
    assert(got.filter(col("w") === 1000.0).count() == 10)
    // determinism: a pure function of (id, weight)
    val again = Sampling.sampleWeighted(weighted, "doc_id", "w", k = 10)
    assert(got.collect().toSeq == again.collect().toSeq)
    // zero/negative/null weights never win — even against k > candidates
    val degenerate = Seq((1L, 0.0), (2L, -5.0), (3L, 2.0)).toDF("doc_id", "w")
    val winners = Sampling.sampleWeighted(degenerate, "doc_id", "w", k = 3)
      .select("doc_id").as[Long].collect().toSeq
    assert(winners == Seq(3L))
  }

  test("sampleWeightedPerGroup yields exact-k per group by weighted rank") {
    val grouped = (0L until 100L)
      .map(i => (i, if (i % 2 == 0) "en" else "de", 1.0 + (i % 7)))
      .toDF("doc_id", "lang", "w")
    val got = Sampling.sampleWeightedPerGroup(grouped, "doc_id", "w", "lang", k = 5)
    val sizes = got.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(sizes == Map("en" -> 5L, "de" -> 5L))
    // ranks are contiguous and priorities non-increasing within a group
    val en = got.filter(col("lang") === "en").orderBy("sample_rank")
      .select("sample_rank", "priority").as[(Int, Double)].collect().toSeq
    assert(en.map(_._1) == (1 to 5))
    assert(en.map(_._2) == en.map(_._2).sorted.reverse)
  }

  test("shardAssign covers every row with dense per-shard positions") {
    val got = Sampling.shardAssign(docs, "doc_id", numShards = 4)
    assert(got.count() == 200)
    // shards partition the corpus; positions are dense 1..|shard|
    val byShard = got.groupBy("shard").count().as[(Int, Long)].collect().toMap
    assert(byShard.keySet.subsetOf(Set(0, 1, 2, 3)) && byShard.values.sum == 200L)
    byShard.foreach { case (sh, n) =>
      val ranks = got.filter(col("shard") === sh)
        .select("pos").as[Int].collect().sorted.toSeq
      assert(ranks == (1 to n.toInt), s"shard $sh positions must be dense")
    }
    // position order is NOT the shard-hash order (independent salt):
    // within a shard, doc ids by pos should not be monotonically the
    // same as by the shard key hash — check it differs from plain id order
    val firstShard = got.filter(col("shard") === byShard.keys.head)
      .orderBy("pos").select("doc_id").as[Long].collect().toSeq
    assert(firstShard != firstShard.sorted, "epoch order must not be id order")
    // deterministic: pure function of ids
    val again = Sampling.shardAssign(docs, "doc_id", numShards = 4)
    assert(got.collect().toSeq == again.collect().toSeq)
  }

  test("cellCentroids averages dimension-wise per cell") {
    val emb = Seq(
      (1L, Array(1.0f, 3.0f), 0),
      (2L, Array(3.0f, 5.0f), 0),
      (3L, Array(10.0f, 10.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.cellCentroids(emb).orderBy("cell", "dim")
      .as[(Int, Int, Double, Long)].collect().toSeq
    assert(got == Seq((0, 0, 2.0, 2L), (0, 1, 4.0, 2L), (1, 0, 10.0, 1L), (1, 1, 10.0, 1L)))
  }

  test("temperatureSample: flattening shares, exact per-stratum yield") {
    // skewed strata: 160 "big" docs, 10 "small"
    val df = ((1L to 160L).map(i => (i, "big")) ++ (201L to 210L).map(i => (i, "small")))
      .toDF("doc_id", "stratum")
    val got = graft.operators.Sampling
      .temperatureSample(df, "doc_id", "stratum", tau = 0.5, budget = 40L)
    val byStratum = got.groupBy("stratum")
      .agg(count(lit(1)).as("n"), first("stratum_budget").as("b"),
        first("share").as("sh"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // tau=0.5: w_big = sqrt(160) ≈ 12.649, w_small = sqrt(10) ≈ 3.162
    // shares ≈ 0.8 / 0.2 — far flatter than the 0.94 / 0.06 raw mix
    val (nBig, bBig, shBig) = byStratum("big")
    val (nSmall, bSmall, shSmall) = byStratum("small")
    assert(shBig < 0.85 && shSmall > 0.15, s"flattened shares: $shBig/$shSmall")
    assert(math.abs(shBig + shSmall - 1.0) < 1e-6)
    assert(nBig == bBig, "big stratum fills its budget exactly")
    assert(nSmall == math.min(bSmall, 10L), "small stratum capped by its size")
    // tau = 1 keeps natural proportions: big gets ~94% of the budget
    val nat = graft.operators.Sampling
      .temperatureSample(df, "doc_id", "stratum", tau = 1.0, budget = 40L)
      .filter(col("stratum") === "big").count()
    assert(nat >= 37, s"tau=1 must track raw proportions, got $nat")
  }

  test("temperatureSample: largest-remainder allocation never exceeds the budget") {
    // randomized strata shapes × budgets; every case must satisfy
    // Σ stratum_budget ≤ budget, and == budget when the floors' total
    // shortfall fits the stratum count (the largest-remainder law)
    val rnd = new scala.util.Random(91)
    for (trial <- 1 to 8) {
      val nStrata = 2 + rnd.nextInt(7)
      val sizes = Seq.fill(nStrata)(1 + rnd.nextInt(500))
      val budget = 1L + rnd.nextInt(3000)
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map { _ => id += 1; (id, s"s$s") }
      }
      val tau = 0.3 + 0.7 * rnd.nextDouble()
      val alloc = graft.operators.Sampling
        .temperatureSample(rows.toDF("doc_id", "stratum"), "doc_id", "stratum",
          tau = tau, budget = budget)
        .select("stratum", "stratum_budget").distinct()
        .as[(String, Long)].collect().toMap
      val total = alloc.values.sum
      assert(total <= budget,
        s"trial $trial (tau=$tau budget=$budget sizes=$sizes): allocated $total > budget")
      assert(alloc.values.forall(_ >= 0L), s"trial $trial: negative allocation")
      // share rounding loses < 1 doc of mass at these budget sizes, so
      // the correction must land the total exactly on the budget
      assert(total == budget,
        s"trial $trial: allocated $total != budget $budget (sizes=$sizes)")
    }
    // million-scale budgets: 6dp share rounding can overshoot or
    // undershoot by MULTIPLE docs — the cumulative cap must still hold
    // Σ ≤ budget (exact equality is not promised in this regime)
    for ((nStrata, budget) <- Seq((3, 10000000L), (7, 50000000L), (40, 25000001L))) {
      val sizes = (1 to nStrata).map(i => 10 + 37 * i)
      var id = 0L
      val rows = sizes.zipWithIndex.flatMap { case (n, s) =>
        (1 to n).map { _ => id += 1; (id, s"s$s") }
      }
      val alloc = graft.operators.Sampling
        .temperatureSample(rows.toDF("doc_id", "stratum"), "doc_id", "stratum",
          tau = 0.7, budget = budget)
        .select("stratum", "stratum_budget").distinct()
        .as[(String, Long)].collect().toMap
      val total = alloc.values.sum
      assert(total <= budget, s"budget=$budget: allocated $total > budget")
      assert(alloc.values.forall(_ >= 0L))
      // and within strata docs of it (the only slack sources are the
      // ±1-per-stratum remainder pass and share-rounding mass)
      assert(budget - total <= nStrata.toLong * 30,
        s"budget=$budget: unexpectedly large shortfall ${budget - total}")
    }
  }

  test("createViews exposes the store to spark.sql") {
    val base = java.nio.file.Files.createTempDirectory("timedb_views").toString
    val db = new TimeDb(spark, base)
    db.create()
    db.write(Seq((1L, ts("2024-03-01T00:00:00Z"), 1.5)).toDF("series_id", "valid_time", "value"))
    db.createViews()
    assert(spark.sql("SELECT value FROM series_values WHERE series_id = 1").as[Double].head() == 1.5)
    assert(spark.sql("SELECT COUNT(*) FROM run_series").as[Long].head() == 1L)
    db.delete()
  }
}
