package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties (SURVEY.md §5.3): the argmax
  * formulation of the latest read is equivalent to the window-dedupe
  * formulation, and the change collapse is idempotent. Gen is sampled
  * with fixed seeds (no scalatestplus bridge in the offline cache). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  // Small dense key spaces force collisions (revisions + corrections).
  private val rowGen = for {
    sid <- Gen.choose(1L, 3L)
    vt <- Gen.choose(0, 3)
    kt <- Gen.choose(0, 3)
    ct <- Gen.choose(0, 3)
    v <- Gen.frequency(9 -> Gen.choose(-5.0, 5.0), 1 -> Gen.const(Double.NaN))
    cb <- Gen.oneOf("a", "b")
  } yield (sid, vt, kt, ct, v, cb)

  private val frameGen = Gen.listOfN(40, rowGen)

  private def sample(seed: Long): List[(Long, Int, Int, Int, Double, String)] =
    frameGen.pureApply(Gen.Parameters.default, Seed(seed))

  private def toFrame(rows: List[(Long, Int, Int, Int, Double, String)]): DataFrame =
    rows.map { case (s, vt, kt, ct, v, cb) =>
      (s, ts(f"2024-01-01T$vt%02d:00:00Z"), ts(f"2024-01-01T$kt%02d:00:00Z"),
        ts(f"2024-01-01T$ct%02d:00:00Z"), v, cb, "")
    }.toDF("series_id", "valid_time", "knowledge_time", "change_time",
      "value", "changed_by", "annotation")

  test("latest (struct-max argmax) ≡ window row_number formulation") {
    for (seed <- 1L to 6L) {
      val df = toFrame(sample(seed))
      val viaAgg = ReadShapesLatest(df)
      val w = Window.partitionBy(col("series_id"), col("valid_time"))
        .orderBy(col("knowledge_time").desc, col("change_time").desc, col("value").desc)
      val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("series_id", "valid_time", "value")
        .orderBy("series_id", "valid_time").collect().toSeq
      // Spark Row.equals treats NaN == NaN, so plain Seq compare works.
      assert(viaAgg == viaWindow, s"seed=$seed")
    }
  }

  private def ReadShapesLatest(df: DataFrame) =
    graft.operators.ReadShapes.latest(df)
      .orderBy("series_id", "valid_time").collect().toSeq

  test("custom ArgMaxLatest hash-aggregate ≡ struct-max formulation (incl. NaN)") {
    for (seed <- 1L to 8L) {
      val df = toFrame(sample(seed))
      val viaCustom = graft.operators.ReadShapes.latest(df)
        .orderBy("series_id", "valid_time").collect().toSeq
      val viaStruct = graft.operators.ReadShapes.latestStructMax(df)
        .orderBy("series_id", "valid_time").collect().toSeq
      assert(viaCustom == viaStruct, s"seed=$seed")
    }
    // plan shape: the custom aggregate must hash-aggregate
    val plan = graft.operators.ReadShapes.latest(toFrame(sample(1)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("SortAggregate"), plan)

    // null keys must not poison the buffer: nulls sort lowest, exactly
    // like struct ordering.
    val withNullKt = toFrame(sample(2))
      .withColumn("knowledge_time",
        when(col("value") > 0, col("knowledge_time")).otherwise(lit(null)))
    val a = graft.operators.ReadShapes.latest(withNullKt)
      .orderBy("series_id", "valid_time").collect().toSeq
    val b = graft.operators.ReadShapes.latestStructMax(withNullKt)
      .orderBy("series_id", "valid_time").collect().toSeq
    assert(a == b, "null-kt divergence")
  }

  test("change collapse is idempotent") {
    for (seed <- 1L to 6L) {
      // Dedupe exact (sid,vt,kt,ct) keys first — a physical store can't
      // hold two rows at the same audit instant.
      val df = toFrame(sample(seed))
        .dropDuplicates("series_id", "valid_time", "knowledge_time", "change_time")
      val once = graft.operators.ReadShapes.overlappingWithChanges(df)
      val twice = graft.operators.ReadShapes.overlappingWithChanges(once)
      assert(
        once.orderBy("series_id", "valid_time", "knowledge_time", "change_time").collect().toSeq ==
          twice.orderBy("series_id", "valid_time", "knowledge_time", "change_time").collect().toSeq,
        s"seed=$seed")
    }
  }

  test("skip-unchanged is a no-op against an empty store") {
    for (seed <- 1L to 3L) {
      val df = toFrame(sample(seed))
      val kept = graft.operators.WritePipeline.filterUnchanged(
        df,
        graft.operators.WritePipeline.storedLatestFor(df.limit(0), graft.operators.UnchangedScope.ValidTime),
        graft.operators.UnchangedScope.ValidTime)
      assert(kept.count() == df.count(), s"seed=$seed")
    }
  }
}
