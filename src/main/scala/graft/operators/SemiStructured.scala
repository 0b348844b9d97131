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

  /** VARIANT-typed promotion — the Spark 4 native path for
    * semi-structured columns: `parse_json` once into the binary
    * variant encoding (what a 100 TB ingest would LAND in storage,
    * open-format shredded and far cheaper to re-extract than raw JSON
    * text), then `variant_get` typed field extraction. Same output
    * contract as [[extractJsonFields]]; prefer this form when the
    * sidecar is stored and re-read by many consumers, the string form
    * when it is parsed exactly once. Malformed JSON rows fail the
    * ingest loudly (`parse_json`, not `try_parse_json`) — a silent
    * null would leak bad rows into storage. */
  def extractVariantFields(df: DataFrame, jsonCol: String,
      fields: Seq[(String, String, String)]): DataFrame = {
    val v = parse_json(col(jsonCol))
    val cols = fields.map { case (out, path, typ) =>
      variant_get(v, path, typ).as(out)
    }
    df.select(df.columns.map(col) ++ cols: _*)
  }
}
