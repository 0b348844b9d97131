package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Key-distribution diagnosis for shuffle planning: the numbers an
  * operator (or a capacity plan) needs BEFORE joining or aggregating on
  * a key at 100 TB — is the key skewed, how hard, and what salt factor
  * would level it. The reference's engine hides this inside ClickHouse's
  * own planner; a Spark pipeline has to decide salting/AQE-skew hints
  * itself, so the profile is a first-class operator here.
  *
  * Plan shape: ONE exchange (the groupBy on the key — the same shuffle
  * the diagnosed operation would pay, so profiling costs what one
  * aggregate costs), then O(distinct-keys) aggregates: a single global
  * agg row plus a top-k heavy-hitter sum via TakeOrdered (never a full
  * sort of the counts table). No collect touches anything unbounded.
  *
  * Output (one row):
  *  - `n_rows`, `n_keys` — volume and cardinality (exact)
  *  - `max_cnt` — the heaviest key's row count
  *  - `max_share` — max_cnt / n_rows, the single-task fraction a
  *    key-partitioned shuffle would concentrate (rounded 6dp)
  *  - `topk_cnt` — total rows under the `k` heaviest keys
  *  - `salt_factor` — ceil(max_cnt · n_keys / n_rows): how many times
  *    the heaviest key exceeds the mean key, i.e. the minimum salt
  *    fan-out that levels the heaviest partition to ~mean load (1 =
  *    balanced, no salting needed)
  */
object Skew {

  def keyProfile(df: DataFrame, keyCol: String, k: Int = 5,
      materialize: Boolean = true): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val counts0 = df.groupBy(col(keyCol).as("__k"))
      .agg(count(lit(1)).as("__cnt"))
    // the counts frame feeds TWO branches (global stats, top-k mass)
    // whose pruned projections differ, so ReuseExchange does NOT share
    // the exchange and the "one exchange" claim silently became "the
    // one exchange, twice" (the r14 pruning finding). The checkpoint
    // is O(distinct keys) — the frame the profile exists to bound —
    // and restores single-pass cost; `materialize = false` opts out
    // for callers that pre-persist.
    val counts = if (materialize) counts0.localCheckpoint() else counts0
    val global = counts.agg(
      sum(col("__cnt")).as("n_rows"),
      count(lit(1)).as("n_keys"),
      max(col("__cnt")).as("max_cnt"))
    // deterministic heavy-hitter pick: count DESC then key ASC with
    // NULLS LAST — Spark's bare asc sorts nulls FIRST while SQL's
    // default ASC sorts them LAST, so a null key tying at the k
    // boundary would otherwise be included by one engine and excluded
    // by the other
    val topk = counts.orderBy(col("__cnt").desc, col("__k").asc_nulls_last).limit(k)
      .agg(sum(col("__cnt")).as("topk_cnt"))
    global.crossJoin(broadcast(topk))
      .select(col("n_rows"), col("n_keys"), col("max_cnt"),
        round(col("max_cnt").cast("double") / col("n_rows"), 6).as("max_share"),
        col("topk_cnt"),
        // max_cnt * n_keys as a DOUBLE product: the Long multiply wraps
        // silently past 2^63 under non-ANSI Spark at the cardinalities
        // this operator targets (max_cnt ~1e9 × n_keys ~1e10), yielding
        // a negative salt factor where the oracle would error instead
        ceil(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"))
          .cast("long").as("salt_factor"))
  }
}
