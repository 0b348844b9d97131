package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * Scope this honestly: for DECOMPOSABLE aggregates (sum/count/min/max)
  * Spark's map-side partial aggregation already bounds what a hot key's
  * reducer receives (one row per key per map task), so salting buys
  * nothing there. Salting earns its keep for HOLISTIC aggregates —
  * collect_list/collect_set, exact distincts, exact percentiles — where
  * the unsalted plan ships every raw row of a hot key to one reducer.
  * Phase 1 spreads each key over `buckets` sub-groups; phase 2 combines
  * `buckets` partial states per key instead of all raw rows.
  *
  * Salts must be DETERMINISTIC under task retry: a salt derived from
  * spark_partition_id / monotonically_increasing_id / rand can re-salt
  * rows differently when a lost executor's map output is recomputed,
  * silently double-counting or dropping rows. We hash the row's columns
  * instead — identical inputs always land in the same (key, salt) group.
  */
object Salting {

  private def salt(df: DataFrame, buckets: Int): Column =
    pmod(xxhash64(df.columns.map(col): _*), lit(buckets))

  /** Profile → plan: the salt fan-out [[Skew.keyProfile]] recommends
    * (its `salt_factor` column — how many times the heaviest key
    * exceeds the mean key), clamped to [1, maxBuckets]. The profile
    * frame is ONE row by construction, so the head() is bounded. This
    * is the diagnose-then-size step a 100 TB pipeline runs before a
    * holistic aggregate on an unknown key: profile once (the same
    * shuffle the aggregate would pay), then salt exactly as hard as
    * the heaviest key demands — a balanced key distribution yields 1
    * (no salting overhead), a 100× hot key yields 100. */
  def bucketsFromProfile(profile: DataFrame, maxBuckets: Int = 4096): Int = {
    require(maxBuckets >= 1, "maxBuckets must be >= 1")
    val r = profile.select(col("salt_factor")).head()
    // an EMPTY profiled input yields one all-null profile row (sums and
    // maxima over nothing) — there is no skew to level, so the sane
    // plan is factor 1, not a primitive-extraction NPE
    if (r.isNullAt(0)) 1
    else math.min(maxBuckets.toLong, math.max(1L, r.getLong(0))).toInt
  }

  /** [[saltedCollectSet]] sized by a [[Skew.keyProfile]] row. */
  def saltedCollectSetProfiled(df: DataFrame, keyCols: Seq[String], valueCol: String,
      profile: DataFrame, maxBuckets: Int = 4096): DataFrame =
    saltedCollectSet(df, keyCols, valueCol, bucketsFromProfile(profile, maxBuckets))

  /** [[saltedStats]] sized by a [[Skew.keyProfile]] row. */
  def saltedStatsProfiled(df: DataFrame, keyCols: Seq[String], valueCol: String,
      profile: DataFrame, maxBuckets: Int = 4096): DataFrame =
    saltedStats(df, keyCols, valueCol, bucketsFromProfile(profile, maxBuckets))

  /** Exact distinct values per key, salted: phase 1 collects per-bucket
    * distinct sets, phase 2 merges `buckets` small arrays per key. The
    * holistic-aggregate case where salting genuinely matters: unsalted,
    * a hot key's reducer receives every raw row. Output: key columns +
    * sorted `distinct_values` array. */
  def saltedCollectSet(df: DataFrame, keyCols: Seq[String], valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val keys = keyCols.map(col)
    df.withColumn("_salt", salt(df, buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(collect_set(col(valueCol)).as("_partial"))
      .groupBy(keys: _*)
      .agg(array_sort(array_distinct(flatten(collect_list(col("_partial")))))
        .as("distinct_values"))
  }

  /** counts + decimal sum + min/max per key through the same two-phase
    * recombination. For these decomposable aggregates the plain groupBy
    * is equally skew-safe (see scaladoc above) — this variant exists to
    * pin that the salted recombination is EXACTLY the plain GROUP BY
    * (its oracle), so the pattern can be trusted where it does matter. */
  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val keys = keyCols.map(col)
    df.withColumn("_salt", salt(df, buckets))
      .groupBy(keys :+ col("_salt"): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_sum"),
        min(col(valueCol)).as("_min"),
        max(col(valueCol)).as("_max"))
      .groupBy(keys: _*)
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("sum_value"),
        min(col("_min")).as("min_value"),
        max(col("_max")).as("max_value"))
  }
}
