package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * A `groupBy(k)` over a key with a few hot values concentrates those
  * keys' rows on single reducers — at 100 TB one task runs for hours
  * while the rest idle. Salting splits each key into `buckets`
  * sub-groups for the partial aggregate (phase 1 spreads a hot key over
  * `buckets` reducers), then combines the partials per real key
  * (phase 2 shuffles only one row per (key, salt)).
  *
  * Results are EXACTLY the plain groupBy's for decomposable aggregates
  * (sum/count/min/max over DECIMAL/integer) — the oracle for a salted
  * query is the unsalted GROUP BY.
  *
  * AQE's skew-join handling covers joins; this covers aggregation skew,
  * which AQE does not rebalance.
  */
object Salting {

  /** counts + decimal sum + min/max of `valueCol` per `keyCols`,
    * two-phase salted. */
  def saltedStats(df: DataFrame, keyCols: Seq[String], valueCol: String, buckets: Int): DataFrame = {
    val keys = keyCols.map(col)
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val partial = salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(
        count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_sum"),
        min(col(valueCol)).as("_min"),
        max(col(valueCol)).as("_max"))
    partial
      .groupBy(keys: _*)
      .agg(
        sum(col("_n")).as("n"),
        sum(col("_sum")).cast("double").as("sum_value"),
        min(col("_min")).as("min_value"),
        max(col("_max")).as("max_value"))
  }
}
