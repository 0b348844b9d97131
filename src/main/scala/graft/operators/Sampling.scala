package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Deterministic sampling for training-data pipelines: membership is a
  * pure function of the row id (a portable hash bucket), never `rand()`
  * — so splits are reproducible across runs, engines, and retries, and
  * a row's assignment never changes as the corpus grows.
  */
object Sampling {

  /** Hash bucket 0..99 for an id column — the basis for percentage
    * splits. Null ids coalesce to a sentinel before hashing so every
    * row lands in exactly one split (a null bucket would silently drop
    * the row from BOTH sides of a split). */
  def bucket(idCol: Column): Column =
    pmod(Portable.hash60(coalesce(idCol.cast("string"), lit("\u0000null-id"))), lit(100))

  /** Keep rows whose bucket falls below a per-stratum percentage.
    * `rates` maps stratum value → percent (0-100); `default` applies to
    * unlisted strata. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], default: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(default)) { case (acc, (value, pct)) =>
      when(col(stratumCol) === value, lit(pct)).otherwise(acc)
    }
    df.filter(bucket(col(idCol)) < rate)
  }

  /** Disjoint train/test split: bucket < testPct → test, else train.
    * Returns (train, test). */
  def trainTestSplit(df: DataFrame, idCol: String, testPct: Int): (DataFrame, DataFrame) = {
    val b = bucket(col(idCol))
    (df.filter(b >= testPct), df.filter(b < testPct))
  }

  /** Leak-free train/eval split — the decontamination step a benchmark
    * or held-out split REQUIRES before the train side ships: split
    * deterministically by id bucket (below `evalPct` → eval), then
    * flag every train document sharing more than `maxOverlap` distinct
    * word `n`-grams with ANY eval document. Emits one row per input
    * doc: `(id, split, leaked_shingles, kept)` — eval rows are always
    * kept; a train row is kept iff its eval-overlap is within bound.
    * The id-hash split means a document's side never changes as the
    * corpus grows, so the leak check stays valid incrementally.
    *
    * Scale shape: per-doc DISTINCT gram hashes come from one
    * [[graft.functions.ShingleHashes]] kernel pass (distinct mode), so
    * the gram stream shuffles `(id, hash)` longs, never text. The eval
    * gram set is `evalPct` of the corpus — the semi-join on `sh` is a
    * standard shuffle equi-join (AQE broadcasts it when the eval side
    * is small). Same candidate shape as benchmark decontamination
    * ([[Dedup.contaminationScores]]), pointed at the split's own eval
    * half instead of an external benchmark. */
  def splitDecontaminated(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", evalPct: Int = 20, n: Int = 3,
      maxOverlap: Long = 0L): DataFrame = {
    require(evalPct > 0 && evalPct < 100, "evalPct must be in (0, 100)")
    require(n >= 1, "shingle size must be >= 1")
    val base = docs.select(col(idCol), col(textCol),
      when(bucket(col(idCol)) < evalPct, lit("eval")).otherwise(lit("train")).as("split"))
    val grams = base.select(col(idCol), col("split"),
      explode(graft.functions.ShingleHashes(col(textCol), n, distinct = true)).as("sh"))
    val evalSet = grams.filter(col("split") === "eval").select("sh").distinct()
    val hits = grams.filter(col("split") === "train")
      .join(evalSet, Seq("sh"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__leaked"))
    base.select(col(idCol), col("split"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("split"),
        when(col("split") === "train", coalesce(col("__leaked"), lit(0L)))
          .otherwise(lit(0L)).as("leaked_shingles"),
        (col("split") === "eval" ||
          coalesce(col("__leaked"), lit(0L)) <= maxOverlap).as("kept"))
  }

  /** Exact-k deterministic sample per group — the eval-set construction
    * primitive ("exactly 200 docs per source"). Rows rank within their
    * group by the portable id hash (a uniform but stable key, tie-broken
    * by the id itself), and the first `k` win, so group yield is exactly
    * `min(k, group size)` — unlike [[stratified]], whose rate-based
    * membership only hits the target in expectation. Re-running, adding
    * unrelated groups, or switching engines never changes a winner set
    * until the group itself gains a lower-hashed row.
    *
    * Scale shape: the rank-≤-k filter is a row_number window, which
    * Spark's WindowGroupLimit pushes to a PRE-shuffle group limit — the
    * exchange carries at most k rows per group per input partition, not
    * the corpus. */
  def samplePerGroup(df: DataFrame, idCol: String, groupCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** The stable per-row ordering key behind [[samplePerGroup]]. */
  def hashKey(idCol: Column): Column =
    Portable.hash60(coalesce(idCol.cast("string"), lit("\u0000null-id")))

  /** Fractional hash bucket in [0, 1) with 1/10000 resolution — the
    * fine-grained variant of [[bucket]] for data-derived (non-integer)
    * sampling rates. Same determinism contract. */
  def fineBucket(idCol: Column): Column =
    pmod(Portable.hash60(coalesce(idCol.cast("string"), lit("\u0000null-id"))),
      lit(10000)).cast("double") / lit(10000.0)

  /** Per-row Efraimidis–Spirakis priority: `u^(1/w)` with `u` a
    * deterministic uniform in (0,1) derived from the portable id hash
    * (6-digit resolution, half-offset so u is never 0 or 1) and `w`
    * the row's weight. Ranking rows by this priority descending and
    * keeping the first k IS weighted sampling without replacement
    * (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    * reservoir"): a row's win probability is proportional to its
    * weight among the remaining rows at every draw. Determinism
    * contract as everywhere in this file: the "randomness" is the id
    * hash, so the sample is reproducible across runs/engines/retries.
    *
    * Rounded to 8dp so the double `pow` (the one libm-dependent op)
    * compares engine-portably — the [[graft.operators.TextAnalysis]]
    * log-prob convention. Non-positive, null, or NaN weights yield a
    * NULL priority; callers filter those rows out (a zero-weight row
    * must never out-rank a weighted one). */
  def weightedPriority(idCol: Column, weightCol: Column): Column = {
    val u = (pmod(Portable.hash60(coalesce(idCol.cast("string"), lit("\u0000null-id"))),
      lit(1000000)).cast("double") + lit(0.5)) / lit(1000000.0)
    val w = weightCol.cast("double")
    round(when(w > 0.0, pow(u, lit(1.0) / w)), 8)
  }

  /** Weighted sampling without replacement, exactly `k` winners per
    * group — the quality- or length-weighted variant of
    * [[samplePerGroup]] ("200 docs per source, long docs favored").
    * Rows rank by [[weightedPriority]] descending (id tiebreak);
    * non-positive/null weights are excluded before ranking.
    *
    * Scale shape: the priority is a pure codegen projection (hash +
    * pow), and the rank-≤-k filter is a row_number window that
    * WindowGroupLimit pushes to a pre-shuffle group limit — the
    * exchange carries at most k rows per group per input partition. */
  def sampleWeightedPerGroup(df: DataFrame, idCol: String, weightCol: String,
      groupCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("priority").desc, col(idCol))
    df.withColumn("priority", weightedPriority(col(idCol), col(weightCol)))
      .filter(col("priority").isNotNull)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** Global weighted sample of exactly `k` rows (no grouping) — same
    * priority contract as [[sampleWeightedPerGroup]]. The
    * orderBy+limit plans as TakeOrderedAndProject: each partition
    * forwards only its local top k, the driver merges — no full sort,
    * no corpus-sized shuffle at any scale. */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    df.withColumn("priority", weightedPriority(col(idCol), col(weightCol)))
      .filter(col("priority").isNotNull)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic shard assignment + within-shard order — the "global
    * shuffle" step before distributed training: every row lands in one
    * of `numShards` shards by id hash, and gets a dense 1-based
    * position within its shard by an INDEPENDENTLY-salted hash (a
    * shard-correlated order would undo the shuffle's decorrelation).
    * Pure function of the id: re-runs, engine switches, and retries
    * reproduce the identical epoch order, and a row's (shard, pos)
    * never changes unless its own shard gains rows.
    *
    * Scale shape: one hash-partitioned exchange on the shard key and a
    * per-shard sort — the minimum any global permutation costs; shards
    * are independent, so the sort parallelizes across them. */
  def shardAssign(df: DataFrame, idCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val posKey = Portable.hash60(concat(lit("pos:"),
      coalesce(col(idCol).cast("string"), lit("\u0000null-id"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(posKey, col(idCol))
    df.withColumn("shard", pmod(hashKey(col(idCol)), lit(numShards)).cast("int"))
      .withColumn("pos", row_number().over(w))
  }

  /** Mixture weighting: down-sample toward target stratum PROPORTIONS —
    * the domain/language mixing step of a training-data pipeline ("make
    * the corpus 50% en / 30% de / 20% zh"). Solves for the largest
    * output size reachable WITHOUT up-sampling (the most under-target
    * stratum keeps 100%), then keeps each stratum deterministically via
    * [[fineBucket]], so the mix is reproducible across runs and engines
    * and a row's fate never changes as unrelated strata grow.
    *
    * Strata absent from `targets` (or with target 0) are dropped.
    * Per-stratum counts are collected — catalog-sized (one row per
    * stratum), the same assumption every mixture-weighting config makes.
    * Rates become plan literals, so the filter is one codegen'd
    * projection at any scale.
    */
  def mixToProportions(df: DataFrame, idCol: String, stratumCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(t => t >= 0.0 && !t.isNaN && !t.isInfinite),
      "target proportions must be finite and non-negative")
    val counts: Map[String, Long] = df
      .filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).cast("string").as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val present = targets.filter { case (s, t) => t > 0 && counts.contains(s) }
    require(present.nonEmpty,
      "no stratum with a positive target is present in the data")
    // K = achievable output size: min over strata of n_s / t_s (the
    // binding stratum keeps 100%); rate_s = K·t_s / n_s ≤ 1.
    val k = present.map { case (s, t) => counts(s).toDouble / t }.min
    val rates = present.map { case (s, t) => s -> math.min(1.0, k * t / counts(s)) }
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (v, r)) =>
      when(col(stratumCol) === v, lit(r)).otherwise(acc)
    }
    df.filter(fineBucket(col(idCol)) < rateCol)
  }

  /** Temperature-scaled mixture sampling (the UniMax/T5 mixing rule):
    * stratum i's share of a `budget`-doc corpus is `n_i^tau / Σ n_j^tau`
    * — tau = 1 keeps natural proportions, tau → 0 flattens toward
    * uniform, the knob that stops one dominant crawl source from
    * drowning the long tail of a pretraining mix.
    *
    * Per-stratum budgets are LARGEST-REMAINDER allocations of
    * floor(share · budget): the floors' shortfall against `budget`
    * goes +1 to the strata with the largest fractional quotas (ties
    * toward the lexicographically first stratum), and the pathological
    * over-allocation 6dp share rounding can produce (shares summing
    * marginally over 1 at million-scale budgets) is clawed back -1
    * from the smallest remainders — so `Σ stratum_budget ≤ budget`
    * ALWAYS (property-pinned), with equality whenever share rounding
    * lost less than one doc of mass. The whole correction is a window
    * over the catalog-sized budget frame, oracle-replayable. The docs
    * themselves are the hash-rank-first rows of each stratum
    * ([[samplePerGroup]]'s WindowGroupLimit shape, with the group
    * limit joined in rather than constant, so one window pass serves
    * every stratum's own k). A stratum with fewer docs than its budget
    * yields everything it has.
    *
    * Determinism: the only libm op is `pow(n, tau)`, rounded to 8dp
    * before the share division (the [[sampleWeighted]] policy); shares
    * round at 6dp decimal-first. Strata are catalog-sized: the budget
    * table broadcasts.
    *
    * Output: the selected rows + (stratum count `n_docs`, `share`,
    * `stratum_budget`, `sample_rank`). */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String,
      tau: Double, budget: Long): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, "tau must be in (0, 1]")
    require(budget >= 1, "budget must be >= 1")
    // The weight total is a whole-frame window over the CATALOG-sized
    // counts frame (the derived-constant single-group key below), not
    // a separate 1-row aggregate: the agg formulation planned its own
    // broadcast-exchange subtree, which cost the query a second
    // scan-and-aggregate job for one number the window pass already
    // has in hand. Same exact decimal sum either way. The key is
    // pmod(n_docs, 1) — always 0, but NOT foldable: n_docs is a
    // non-nullable count, so the Curation trick (`x * 0`) would be
    // constant-folded here (the multiply-by-zero rule fires exactly
    // when the column is non-nullable), emptying the partition spec.
    // The key is MATERIALIZED once as `__one` and every window below
    // partitions by that same attribute: the r14 form re-derived
    // pmod(n_docs, 1) inside each Window spec, each got its own
    // projected attribute, the partitionings stopped looking equal,
    // and the planner inserted FOUR exchanges (each with its own
    // sort + codegen stage) into a frame of |strata| rows — one
    // exchange is enough when the attribute is shared.
    val counts = df.filter(col(stratumCol).isNotNull)
      .groupBy(stratumCol).agg(count(lit(1)).as("n_docs"))
      .select(col(stratumCol), col("n_docs"),
        round(pow(col("n_docs").cast("double"), lit(tau)), 8).as("__w"),
        pmod(col("n_docs"), lit(1L)).as("__one"))
    val wTot = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__one"))
    val quotas = counts
      .withColumn("__tw", sum(col("__w").cast("decimal(28,8)")).over(wTot))
      // share divides in DOUBLE (a true-double quantity: its half-way
      // cases are measure-zero — ADVICE item A's class B), numerator
      // and denominator both exact 8dp decimals widened losslessly
      .withColumn("share",
        round(col("__w").cast("double") / col("__tw").cast("double"), 6))
      .withColumn("__q", col("share") * lit(budget.toDouble))
      .withColumn("__base", floor(col("__q")).cast("long"))
      .withColumn("__rem", round(col("__q") - floor(col("__q")), 6))
    // Largest-remainder correction over the catalog-sized frame: one
    // whole-frame window (the derived-constant partition key — the
    // Curation single-group discipline; O(strata) rows regardless of
    // data volume). `__extra` ≥ 0 is the usual floor shortfall, handed
    // +1 to the `__extra` largest remainders. The CUMULATIVE CAP below
    // then enforces Σ ≤ budget unconditionally: allocations consume a
    // running capacity in remainder-rank order, so when 6dp share
    // rounding overshoots at huge budgets (shares can each round up by
    // ~5e-7, an overshoot of budget·strata·5e-7 — multiple docs at
    // million-scale budgets, which a ±1-per-stratum correction cannot
    // absorb) the smallest-remainder strata truncate by exactly the
    // excess. Down-rounding at the same scale can leave the total
    // short of the budget (a shortfall > strata escapes the +1 pass) —
    // under-allocation is the safe side and stays documented.
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__one"))
    val wRk = wAll.orderBy(col("__rem").desc, col(stratumCol))
    val wRun = wRk.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    val budgets = quotas
      .withColumn("__rk", row_number().over(wRk))
      .withColumn("__extra", lit(budget) - sum(col("__base")).over(wAll))
      .withColumn("__alloc0",
        col("__base") +
          when(col("__extra") > 0 && col("__rk") <= col("__extra"), 1L).otherwise(0L))
      .withColumn("__run", sum(col("__alloc0")).over(wRun))
      .withColumn("stratum_budget", greatest(lit(0L),
        least(col("__alloc0"), lit(budget) - (col("__run") - col("__alloc0")))))
      .select(col(stratumCol), col("n_docs"), col("share"), col("stratum_budget"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashKey(col(idCol)), col(idCol))
    df.join(broadcast(budgets), Seq(stratumCol))
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= col("stratum_budget"))
  }
}
