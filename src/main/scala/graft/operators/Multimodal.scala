package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.12 X5): media payloads as
  * opaque `BinaryType` columns alongside a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * The media libraries (image/audio codecs) are not in this environment,
  * so the *decode kernels are deterministic stubs* — clearly marked below
  * — while everything Spark-side is real and tested: the schema, the
  * binary column handling, partition-preserving `mapPartitions` batch
  * shape (the Scala analog of `mapInPandas`: one iterator per partition,
  * amortizing per-batch model/codec setup), and the relational plumbing
  * around it.
  */
object Multimodal {

  /** Typed metadata carried next to the opaque payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false)))

  /** Build an asset table from any (id, text) table: the UTF-8 bytes of
    * the text play the role of an encoded media payload, and metadata is
    * derived from payload length. Purely columnar — this is the ingest
    * path a real pipeline would have after reading image bytes from
    * object storage. */
  def assetsFromText(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("asset_id"),
      encode(col(textCol), "UTF-8").as("media"),
      struct(
        lit("fake/raw").as("format"),
        (octet_length(encode(col(textCol), "UTF-8")) % 64 + 1).cast("int").as("width"),
        (octet_length(encode(col(textCol), "UTF-8")) / 64 + 1).cast("int").as("height"),
        (octet_length(encode(col(textCol), "UTF-8")) / 32 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode kernel: a real implementation would hand `bytes` to an
    * image codec here. The deterministic fake derives a fixed-length
    * "pixel" feature vector from the payload bytes so the pipeline shape
    * (binary in → fixed-width float vector out) is faithful. */
  private def decodeStub(bytes: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < bytes.length) { out(i % dim) += (bytes(i) & 0xFF) / 255.0; i += 1 }
    out
  }

  /** Decode + feature-extract over partition-sized batches.
    * `mapPartitions` (not a per-row UDF) is deliberate: codec/model
    * initialization happens once per partition, the iterator streams rows
    * without materializing the partition, and partitioning is preserved —
    * the same batch contract as `mapInPandas` at 100 TB. */
  def decodeFeatures(assets: DataFrame, dim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("features", ArrayType(DoubleType)),
      StructField("n_bytes", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select("asset_id", "media").mapPartitions { rows =>
      // (real pipeline: initialize the codec once here)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media")
        Row(r.getLong(0), decodeStub(bytes, dim).toSeq, bytes.length)
      }
    }(enc)
  }

  /** "Resize": recompute metadata to a bounded box, payload untouched —
    * metadata-only transforms stay pure projections. */
  def resizeMeta(assets: DataFrame, maxW: Int, maxH: Int): DataFrame =
    assets.withColumn("meta", struct(
      col("meta.format"),
      least(col("meta.width"), lit(maxW)).as("width"),
      least(col("meta.height"), lit(maxH)).as("height"),
      col("meta.n_frames")))

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size
    * slice of the payload becomes one frame row (ceiling count, so the
    * trailing partial window still yields its frame — possibly short at
    * payload end). Pure columnar explode — no UDF — so it stays inside
    * whole-stage codegen. */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val span = frameBytes * stride
    assets
      .select(col("asset_id"), col("media"),
        explode(sequence(lit(0),
          greatest(expr(s"(octet_length(media) + ${span - 1}) div $span").cast("int") - 1, lit(0))))
          .as("frame_no"))
      .select(col("asset_id"), col("frame_no"),
        col("media").substr(col("frame_no") * span + 1, lit(frameBytes)).as("frame"))
  }
}
