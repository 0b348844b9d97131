package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-structured payload handling — the `props`-style JSON sidecar
  * column every event/crawl table carries. At 100 TB the rule is: parse
  * once, project to typed columns early (so Parquet stats and codegen
  * apply downstream), and never re-parse per consumer.
  */
object SemiStructured {

  /** Extract scalar JSON fields to typed top-level columns via Spark's
    * codegen'd `get_json_object` (one shared Jackson parse per row for
    * all paths). `fields` maps output column -> (JSONPath, cast type).
    * Missing paths yield null, matching JSON semantics. Pure projection
    * — no shuffle; at scale this runs once at ingest and the typed
    * columns are what lands in storage. */
  def extractJsonFields(df: DataFrame, jsonCol: String,
      fields: Seq[(String, String, String)]): DataFrame = {
    val cols = fields.map { case (out, path, typ) =>
      get_json_object(col(jsonCol), path).cast(typ).as(out)
    }
    df.select(df.columns.map(col) ++ cols: _*)
  }

  /** Frequency of each top-level key across a JSON column — the schema
    * discovery pass that decides WHICH fields to promote to typed
    * columns. `json_object_keys` + explode + count: one map-side-combined
    * aggregate keyed by the key name. */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame =
    df.select(explode(json_object_keys(col(jsonCol))).as("key"))
      .groupBy("key")
      .agg(count(lit(1)).as("freq"))
}
