package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Deduplication operators for LLM-training-data pipelines
  * (SURVEY.md §2.12 X1/X2), designed around shuffle-on-key patterns that
  * scale linearly with data volume: every stage is a groupBy/join on a
  * content-derived key, so 100 TB spreads across
  * `spark.sql.shuffle.partitions` with no driver-side state.
  *
  * Inputs are a document table with (`idCol`, `textCol`).
  */
object Dedup {

  /** Exact dedup (X1): one winner (minimum id) per md5(text). A single
    * partial+final hash aggregate — the map-side combine means the shuffle
    * carries one row per distinct digest per mapper.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs
      .withColumn("digest", md5(col(textCol).cast("binary")))
      .groupBy("digest")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("copies"))
      .select(col(idCol), col("digest"), col("copies"))

  /** Distinct word-n-gram shingles per doc: (id, shingle-hash32). The
    * inverted-index building block shared by Jaccard and MinHash. */
  def shingles(docs: DataFrame, n: Int, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col(idCol),
      filter(split(col(textCol), " "), t => t =!= "").as("toks"))
    // n-gram i = toks[i..i+n-1] joined by space (size−n+1 grams); transform
    // over the index range keeps this a single codegen'd projection (no
    // explode before the distinct).
    val grams = toks.select(
      col(idCol),
      when(size(col("toks")) >= n,
        transform(
          sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
        .otherwise(array().cast("array<string>"))
        .as("grams"))
    grams
      .select(col(idCol), explode(col("grams")).as("gram"))
      .select(col(idCol), Portable.hash32(col("gram")).as("sh"))
      .distinct()
  }

  /** N-gram Jaccard near-dup pairs (X2): inverted-index self-join on the
    * shingle hash, count co-occurrences per pair, Jaccard =
    * |∩| / (|A|+|B|−|∩|), keep pairs ≥ threshold.
    *
    * The join key is the shingle, so each shingle's posting list is one
    * shuffle bucket — the standard "candidate pairs via inverted index"
    * plan that avoids the O(n²) cross join entirely.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingles(docs, n, idCol, textCol)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val a = sh.select(col(idCol).as("id_a"), col("sh"))
    val b = sh.select(col(idCol).as("id_b"), col("sh"))
    val inter = a.join(b, "sh")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("inter"), col("sz_a"), col("sz_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures (X2): for each doc, `numHashes` permutation
    * minima over its shingle hashes. Output: (id, i, sig). One aggregate
    * after a flat `numHashes`-way expansion of the shingle stream —
    * map-side combine reduces each (doc, i) group to its running min
    * before the shuffle.
    */
  def minHashSignatures(docs: DataFrame, n: Int, numHashes: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingles(docs, n, idCol, textCol)
    val perms = explode(array((0 until numHashes).map { i =>
      struct(lit(i).as("i"), Portable.minHashPerm(col("sh"), i).as("hv"))
    }: _*)).as("p")
    sh.select(col(idCol), perms)
      .groupBy(col(idCol), col("p.i").as("i"))
      .agg(min(col("p.hv")).as("sig"))
  }

  /** MinHash + LSH near-dup candidates (X2, the scale path): band the
    * signature vector (`bands` bands of `numHashes/bands` rows), bucket
    * docs by (band, banded-signature-hash), and emit distinct candidate
    * pairs that share ≥1 bucket. Each band join is an equi-join on the
    * band key — the O(n²) pair space is never materialized, only true
    * bucket collisions.
    */
  def minHashLshCandidates(docs: DataFrame, n: Int, numHashes: Int, bands: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val rows = numHashes / bands
    val sigs = minHashSignatures(docs, n, numHashes, idCol, textCol)
    val banded = sigs
      .withColumn("band", (col("i") / rows).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("i"), col("sig")))),
          s => s.getField("sig").cast("string")),
        ",").as("band_key"))
    val l = banded.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val r = banded.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** SimHash fingerprint (X2): 48-bit weighted-bit-vote fingerprint over
    * the doc's distinct shingles. Near-dups then reduce to Hamming
    * proximity on a 64-bit integer — cheap to band/bucket at scale.
    * 48 bits keeps every partial sum and the final `Σ bit<<b` inside a
    * non-negative BIGINT in both engines. */
  def simHash(docs: DataFrame, n: Int, bits: Int = 48,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val sh = shingles(docs, n, idCol, textCol)
      .select(col(idCol), Portable.hash60(col("sh").cast("string")).as("h"))
    sh.select(col(idCol), col("h"), explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .withColumn("vote",
        when(expr("shiftright(h, b) & 1") === 1, 1).otherwise(-1))
      .groupBy(col(idCol), col("b"))
      .agg(sum(col("vote")).as("votes"))
      .groupBy(col(idCol))
      .agg(sum(when(col("votes") > 0, expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
        .as("simhash"))
  }

  /** Embedding-cosine near-dup pairs (X2/X3 hybrid): pairs with cosine ≥
    * threshold, blocked by a coarse `blockCol` (e.g. a cluster/label id)
    * so the pairwise join is per-block, not global — the blocking key is
    * what keeps this O(Σ block²) instead of O(n²) at scale. */
  def embeddingNearDup(emb: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding", blockCol: String = "label"): DataFrame = {
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", Portable.cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("blk"), col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
