package graft

import org.apache.spark.sql.functions._

import graft.functions.ShingleHashes

/** The kernels' SQL surface: every registered function must evaluate
  * identically to its Column-API form, and the `spark.sql.extensions`
  * injection class must register the same set. */
class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val registered: Unit = GraftExtensions.register(spark)

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a b c d"),
    (3L, "solo")).toDF("doc_id", "text")

  test("SQL shingle_hashes / minhash / simhash / fingerprint match the Column API") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id,
        |  shingle_hashes(text, 2) AS grams,
        |  shingle_hashes(text, 2, true) AS grams_distinct,
        |  minhash_from_grams(shingle_hashes(text, 2), 16) AS sigs,
        |  simhash_from_grams(shingle_hashes(text, 2), 48) AS simhash,
        |  text_fingerprint(text) AS fp
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    val api = docs.select(col("doc_id"),
      ShingleHashes(col("text"), 2).as("grams"),
      ShingleHashes(col("text"), 2, distinct = true).as("grams_distinct"),
      graft.functions.MinHashFromGrams(ShingleHashes(col("text"), 2), 16).as("sigs"),
      graft.functions.SimHashFromGrams(ShingleHashes(col("text"), 2), 48).as("simhash"),
      graft.functions.TextFingerprint(col("text")).as("fp"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
  }

  test("SQL holt_linear matches the Column API; bad args rejected") {
    registered
    Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq.empty[Double]))
      .toDF("id", "vals").createOrReplaceTempView("ext_series")
    val sql = spark.sql(
      "SELECT id, holt_linear(vals, 0.5, 0.25) AS h FROM ext_series ORDER BY id")
      .collect()
    val api = Seq((1L, Seq(1.0, 2.0, 3.0)), (2L, Seq.empty[Double]))
      .toDF("id", "vals")
      .select(col("id"),
        graft.functions.HoltLinear(col("vals"), 0.5, 0.25).as("h"))
      .orderBy("id").collect()
    assert(sql.toSeq == api.toSeq)
    assert(sql(0).getStruct(1).getDouble(0) == 2.3125) // hand-computed level
    assert(sql(1).isNullAt(1)) // empty series -> null struct
    val e = intercept[Exception] {
      spark.sql("SELECT holt_linear(vals, 'x', 0.25) FROM ext_series").collect()
    }
    assert(e.getMessage.contains("alpha"))
  }

  test("SQL text_stats and span_digests match the Column API") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id,
        |  text_stats(text, 'the', 'a', 'and', 'of', 'to', 'in') AS st,
        |  span_digests(text, 3, true) AS sp,
        |  span_digests(text, 3) AS spd
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    val api = docs.select(col("doc_id"),
      graft.functions.TextStats(col("text"),
        Seq("the", "a", "and", "of", "to", "in")).as("st"),
      graft.functions.SpanDigests(col("text"), 3, withText = true).as("sp"),
      graft.functions.SpanDigests(col("text"), 3, withText = false).as("spd"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
    // non-literal stopword rejected with a clear error
    val e = intercept[Exception] {
      spark.sql("SELECT text_stats(text, text) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("text_stats"))
  }

  test("SQL term_counts matches the Column API; terms must be literals") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      """SELECT doc_id, term_counts(text, 'the', 'data') AS tc
        |FROM ext_docs ORDER BY doc_id""".stripMargin).collect()
    val api = docs.select(col("doc_id"),
      graft.functions.TermCounts(col("text"), Seq("the", "data")).as("tc"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
    val e = intercept[Exception] {
      spark.sql("SELECT term_counts(text, text) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("term_counts"))
  }

  test("SQL cdc_chunks matches the Column API; cardinality args must be literals") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      "SELECT doc_id, cdc_chunks(text, 4, 16) AS c FROM ext_docs ORDER BY doc_id")
      .collect()
    val api = docs.select(col("doc_id"),
      graft.functions.CdcChunks(col("text"), 4, 16).as("c"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
    val e = intercept[Exception] {
      spark.sql("SELECT cdc_chunks(text, doc_id, 16) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("cdc_chunks"))
    // 5-arg bounded (production) form resolves and matches the Column API
    val sqlBounded = spark.sql(
      "SELECT doc_id, cdc_chunks(text, 4, 16, 4, 24) AS c FROM ext_docs ORDER BY doc_id")
      .collect()
    val apiBounded = docs.select(col("doc_id"),
      graft.functions.CdcChunks(col("text"), 4, 16, 4, 24).as("c"))
      .orderBy("doc_id").collect()
    assert(sqlBounded.toSeq == apiBounded.toSeq)
  }

  test("SQL sorted_intersect_count and float_vector_dot match the Column API") {
    registered
    val arrs = Seq((Array(1L, 3L, 5L), Array(1L, 2L, 5L), Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("a", "b", "va", "vb")
    arrs.createOrReplaceTempView("ext_arrs")
    val row = spark.sql(
      """SELECT sorted_intersect_count(a, b) AS ic, float_vector_dot(va, vb) AS dot
        |FROM ext_arrs""".stripMargin).head()
    assert(row.getLong(0) == 2L)
    assert(row.getDouble(1) == 11.0)
  }

  test("wrong-typed kernel input fails at ANALYSIS, not mid-job") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    // array<int> into a long-array kernel would read misaligned bytes
    val e1 = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array(1, 2), array(1, 2))").collect()
    }
    assert(e1.getMessage.contains("array<bigint>"), e1.getMessage)
    // non-string text into the tokenizing kernels
    val e2 = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(doc_id, 2) FROM ext_docs").collect()
    }
    assert(e2.getMessage.contains("must be string"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("SELECT float_vector_dot(array(1.0, 2.0), array(1.0))").collect()
    }
    assert(e3.getMessage.contains("array<float>"), e3.getMessage)
  }

  test("nullable-element arrays are rejected at ANALYSIS by the long-array kernels") {
    registered
    // array(1L, NULL) types as array<bigint> with containsNull=true; the
    // kernels' getLong stride would read the null element as gram/value
    // 0 SILENTLY — a plausible wrong signature with no error. Rejecting
    // the TYPE at analysis is the only sound gate (runtime can't tell a
    // real 0 from a null-read 0).
    for (expr <- Seq(
        "minhash_from_grams(array(1L, CAST(NULL AS BIGINT)), 4)",
        "simhash_from_grams(array(1L, CAST(NULL AS BIGINT)), 16)",
        "sorted_intersect_count(array(1L, CAST(NULL AS BIGINT)), array(1L))")) {
      val e = intercept[Exception] { spark.sql(s"SELECT $expr").collect() }
      assert(e.getMessage.contains("WITHOUT null"), s"$expr: ${e.getMessage}")
    }
    // the documented remedy compiles and runs: array_compact drops the
    // nulls AND narrows containsNull (a lambda filter would not)
    val ok = spark.sql(
      """SELECT sorted_intersect_count(
        |  array_compact(array(1L, CAST(NULL AS BIGINT), 3L)),
        |  array(1L, 3L)) AS c""".stripMargin).head().getLong(0)
    assert(ok == 2L)
  }

  test("sorted_intersect_count fails loudly on unsorted input") {
    registered
    // a = [5, 1, 9]: the merge must STEP onto the out-of-order element
    // (it skips validation of elements it never reads — those can't
    // affect the count)
    val e = intercept[Exception] {
      spark.sql("SELECT sorted_intersect_count(array(5L, 1L, 9L), array(1L, 9L))").collect()
    }
    assert(String.valueOf(e.getMessage).contains("sorted ascending") ||
      String.valueOf(e.getCause).contains("sorted ascending"), e.getMessage)
    // ... and the error names the remedy
    assert(String.valueOf(e.getMessage).contains("sort_array") ||
      String.valueOf(e.getCause).contains("sort_array"))
  }

  test("non-literal cardinality argument is rejected with a clear error") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val e = intercept[Exception] {
      spark.sql("SELECT shingle_hashes(text, CAST(doc_id AS INT)) FROM ext_docs").collect()
    }
    assert(e.getMessage.contains("INTEGER literal") ||
      String.valueOf(e.getCause).contains("INTEGER literal"), e.getMessage)
  }

  test("SQL token_hash_counts matches the Column API and the agg formulation") {
    registered
    docs.createOrReplaceTempView("ext_docs")
    val sql = spark.sql(
      "SELECT doc_id, token_hash_counts(text) AS tc FROM ext_docs ORDER BY doc_id")
      .collect()
    val api = docs.select(col("doc_id"),
      graft.functions.TokenHashCounts(col("text")).as("tc"))
      .orderBy("doc_id").collect()
    assert(sql.toSeq == api.toSeq)
    // and the whole thing is the row-local groupBy: re-aggregate in SQL
    val viaSql = spark.sql("""
      SELECT doc_id, e.w, e.m FROM ext_docs
      LATERAL VIEW explode(token_hash_counts(text)) AS e""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaAgg = spark.sql("""
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS m FROM (
        SELECT doc_id, explode(shingle_hashes(text, 1)) AS w FROM ext_docs)
      GROUP BY doc_id, w""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaSql == viaAgg)
  }

  test("the SparkSessionExtensions class injects the shared function set") {
    // A fresh session isn't available mid-JVM (getOrCreate reuses the
    // test session), so pin what CAN be pinned: applying the extensions
    // class to a fresh SparkSessionExtensions succeeds (every triple is
    // injectFunction-shaped), and both entry points share ONE function
    // list, whose names are the documented surface.
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    assert(GraftExtensions.functions.map(_._1.funcName).toSet ==
      Set("shingle_hashes", "minhash_from_grams", "simhash_from_grams",
        "sorted_intersect_count", "text_fingerprint", "float_vector_dot",
        "byte_vector_dot", "text_stats", "term_counts", "span_digests",
        "code_lut_sum", "cdc_chunks", "morton_interleave",
        "token_hash_counts", "holt_linear"))
  }

  test("SQL morton_interleave matches the Column API and rejects bad args") {
    registered
    // known bit pattern: bx=0b11 → bits 0,2 = 5; by=0b01 → bit 1 = 2
    assert(spark.sql("SELECT morton_interleave(3L, 1L, 4) AS z")
      .head().getLong(0) == 7L)
    // parity with the Column-API kernel across a value sweep
    val df = spark.range(0, 200)
      .selectExpr("id * 37 % 4096 AS bx", "id * 91 % 4096 AS by")
    df.createOrReplaceTempView("mi_probe")
    val viaSql = spark.sql(
      "SELECT morton_interleave(bx, by, 12) AS z FROM mi_probe ORDER BY bx, by")
      .collect().map(_.getLong(0)).toSeq
    val viaCol = df.select(graft.functions.MortonInterleave(
        org.apache.spark.sql.functions.col("bx"),
        org.apache.spark.sql.functions.col("by"), 12).as("z"))
      .orderBy("bx", "by").collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaCol)
    // wrong-typed input fails at analysis
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT morton_interleave('a', 1L, 4)").collect()
    }
    assert(e.getMessage.contains("BIGINT"))
    // non-literal bits rejected with a clear error
    val e2 = intercept[Exception] {
      spark.sql("SELECT morton_interleave(bx, by, CAST(bx AS INT)) FROM mi_probe").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("literal"))
  }

  test("code_lut_sum sums LUT entries exactly and nulls on misuse") {
    registered
    // exact micro-unit sum of 6dp entries (0.1 + 0.2 is NOT 0.3 in
    // naive double addition — the kernel must still return exactly 0.3)
    val ok = spark.sql(
      """SELECT code_lut_sum(array(0, 1),
        |  array(array(0.1D, 9.9D), array(5.5D, 0.2D))) AS s""".stripMargin)
      .head().getDouble(0)
    assert(ok == 0.3)
    // out-of-range code (wrong codebook for this LUT) -> NULL, not 0
    val oor = spark.sql(
      "SELECT code_lut_sum(array(3), array(array(0.1D))) AS s").head()
    assert(oor.isNullAt(0))
    // null code element -> NULL
    val nc = spark.sql(
      "SELECT code_lut_sum(array(CAST(NULL AS INT)), array(array(0.1D))) AS s").head()
    assert(nc.isNullAt(0))
  }
}
