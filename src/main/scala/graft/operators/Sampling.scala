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
    * splits. */
  def bucket(idCol: Column): Column =
    pmod(Portable.hash60(idCol.cast("string")), lit(100))

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
}
