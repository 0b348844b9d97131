package graft

import org.apache.spark.sql.{GraftFunctionRegistryBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

import graft.functions._

/** SQL surface for graft's codegen kernels: registers each custom
  * `Expression` as a named SQL function, so the whole kernel layer is
  * usable from `spark.sql(...)` / `selectExpr` — not only the Scala
  * Column API. Two entry points:
  *
  *  - cluster-wide: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard `SparkSessionExtensions` injection point — every
  *    session on the cluster gets the functions at build time);
  *  - per-session: `GraftExtensions.register(spark)` for sessions that
  *    already exist (tests, notebooks).
  *
  * Cardinality arguments (n, numHashes, bits) must be integer literals
  * — they parameterize generated code, exactly like the Column API's
  * plain-Int parameters.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INTEGER literal, got $other")
  }

  private def doubleLit(e: Expression, fn: String, arg: String): Double = e match {
    case Literal(v: Double, DoubleType) => v
    case Literal(v: Int, IntegerType) => v.toDouble
    case Literal(v: org.apache.spark.sql.types.Decimal, _: DecimalType) => v.toDouble
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a numeric literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** (identifier, info, builder) triple per kernel — the shape
    * `SparkSessionExtensions.injectFunction` consumes. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes",
        "shingle_hashes(text, n[, distinct]) - word-n-gram shingle-hash array; distinct=true dedups sorted"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) =>
          ShingleHashes(text, intLit(n, "shingle_hashes", "n"))
        case Seq(text, n, Literal(d: Boolean, _)) =>
          ShingleHashes(text, intLit(n, "shingle_hashes", "n"), d)
        case Seq(_, _, d) => throw new IllegalArgumentException(
          s"shingle_hashes: distinct must be a BOOLEAN literal, got $d")
        case other => throw new IllegalArgumentException(
          s"shingle_hashes expects (text, n[, distinct literal]), got ${other.size} args")
      }),
    (FunctionIdentifier("token_hash_counts"),
      info("token_hash_counts",
        "token_hash_counts(text) - per-row term frequencies: array of " +
          "struct(w, m), distinct token hashes (shingle_hashes n=1 semantics) " +
          "with multiplicities, sorted by hash — the row-local equivalent of " +
          "explode + groupBy + count, with zero exchange"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TokenHashCounts(text)
        case other => throw new IllegalArgumentException(
          s"token_hash_counts expects (text), got ${other.size} args")
      }),
    (FunctionIdentifier("minhash_from_grams"),
      info("minhash_from_grams",
        "minhash_from_grams(grams, numHashes) - MinHash signature array of a gram-hash array"),
      (args: Seq[Expression]) => args match {
        case Seq(grams, k) =>
          MinHashFromGrams(grams, intLit(k, "minhash_from_grams", "numHashes"))
        case other => throw new IllegalArgumentException(
          s"minhash_from_grams expects (grams, numHashes), got ${other.size} args")
      }),
    (FunctionIdentifier("simhash_from_grams"),
      info("simhash_from_grams",
        "simhash_from_grams(grams, bits) - frequency-weighted SimHash fingerprint of a gram-hash array"),
      (args: Seq[Expression]) => args match {
        case Seq(grams, bits) =>
          SimHashFromGrams(grams, intLit(bits, "simhash_from_grams", "bits"))
        case other => throw new IllegalArgumentException(
          s"simhash_from_grams expects (grams, bits), got ${other.size} args")
      }),
    (FunctionIdentifier("holt_linear"),
      info("holt_linear",
        "holt_linear(values, alpha, beta) - Holt double-exponential smoothing " +
          "fold over an ORDERED array<double>: struct(level, trend, forecast); " +
          "null elements skipped, empty/all-null array yields null"),
      (args: Seq[Expression]) => args match {
        case Seq(values, a, b) =>
          HoltLinear(values, doubleLit(a, "holt_linear", "alpha"),
            doubleLit(b, "holt_linear", "beta"))
        case other => throw new IllegalArgumentException(
          s"holt_linear expects (values, alpha, beta), got ${other.size} args")
      }),
    (FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count",
        "sorted_intersect_count(a, b) - |A intersect B| of two long arrays that MUST be " +
          "sorted ascending (use sort_array(); unsorted input fails the query at runtime); " +
          "zero-alloc two-pointer merge"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => SortedIntersectCount(a, b)
        case other => throw new IllegalArgumentException(
          s"sorted_intersect_count expects (a, b), got ${other.size} args")
      }),
    (FunctionIdentifier("morton_interleave"),
      info("morton_interleave",
        "morton_interleave(bx, by, bits) - z-order address: interleaves the low " +
          "`bits` bits of two BIGINT bucket ids (bx at even positions, by at odd)"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b, bits) =>
          MortonInterleave(a, b, intLit(bits, "morton_interleave", "bits"))
        case other => throw new IllegalArgumentException(
          s"morton_interleave expects (bx, by, bits), got ${other.size} args")
      }),
    (FunctionIdentifier("cdc_chunks"),
      info("cdc_chunks",
        "cdc_chunks(text, window, avgSize) - content-defined chunks: array of " +
          "struct(start, len, digest); rolling-hash boundaries over the last `window` " +
          "code points, ~avgSize chars per chunk, portable 60-bit md5 digests"),
      (args: Seq[Expression]) => args match {
        case Seq(text, w, m) =>
          CdcChunks(text, intLit(w, "cdc_chunks", "window"),
            intLit(m, "cdc_chunks", "avgSize"))
        case Seq(text, w, m, lo, hi) => // bounded production variant
          CdcChunks(text, intLit(w, "cdc_chunks", "window"),
            intLit(m, "cdc_chunks", "avgSize"),
            intLit(lo, "cdc_chunks", "minSize"),
            intLit(hi, "cdc_chunks", "maxSize"))
        case other => throw new IllegalArgumentException(
          s"cdc_chunks expects (text, window, avgSize[, minSize, maxSize]), " +
            s"got ${other.size} args")
      }),
    (FunctionIdentifier("text_fingerprint"),
      info("text_fingerprint",
        "text_fingerprint(text) - order-sensitive positional rolling-hash fingerprint"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => TextFingerprint(text)
        case other => throw new IllegalArgumentException(
          s"text_fingerprint expects (text), got ${other.size} args")
      }),
    (FunctionIdentifier("float_vector_dot"),
      info("float_vector_dot",
        "float_vector_dot(a, b) - dot product of two float arrays, double accumulation in array order"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => FloatVectorDot(a, b)
        case other => throw new IllegalArgumentException(
          s"float_vector_dot expects (a, b), got ${other.size} args")
      }),
    (FunctionIdentifier("byte_vector_dot"),
      info("byte_vector_dot",
        "byte_vector_dot(a, b) - integer dot product of two tinyint arrays (int8-quantized vectors), long accumulation"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => ByteVectorDot(a, b)
        case other => throw new IllegalArgumentException(
          s"byte_vector_dot expects (a, b), got ${other.size} args")
      }),
    (FunctionIdentifier("code_lut_sum"),
      info("code_lut_sum",
        "code_lut_sum(codes, lut) - PQ ADC score: sum of lut[s][codes[s]] over subspaces, " +
          "exact micro-unit accumulation of 6dp-rounded entries; NULL on out-of-range/null"),
      (args: Seq[Expression]) => args match {
        case Seq(codes, lut) => CodeLutSum(codes, lut)
        case other => throw new IllegalArgumentException(
          s"code_lut_sum expects (codes, lut), got ${other.size} args")
      }),
    (FunctionIdentifier("text_stats"),
      info("text_stats",
        "text_stats(text[, stopwords...]) - single-pass struct(n_chars, n_tokens, n_stop, " +
          "n_digits, word_tokens); stopwords are STRING literals counted with multiplicity"),
      (args: Seq[Expression]) => args match {
        case text +: stops if stops.forall {
            case Literal(s, t) => s != null && t == org.apache.spark.sql.types.StringType
            case _ => false
          } =>
          TextStats(text, stops.map {
            case Literal(s, _) => s.toString
            case _ => throw new IllegalStateException("unreachable")
          })
        case other => throw new IllegalArgumentException(
          s"text_stats expects (text[, stopword STRING literals...]), got $other")
      }),
    (FunctionIdentifier("term_counts"),
      info("term_counts",
        "term_counts(text, terms...) - single-pass array<long> [dl, tf_0, ..., tf_{q-1}]: " +
          "token count plus per-literal-term term frequencies (tokens split on single space)"),
      (args: Seq[Expression]) => args match {
        case text +: terms if terms.nonEmpty && terms.forall {
            case Literal(s, t) => s != null && t == org.apache.spark.sql.types.StringType
            case _ => false
          } =>
          TermCounts(text, terms.map {
            case Literal(s, _) => s.toString
            case _ => throw new IllegalStateException("unreachable")
          })
        case other => throw new IllegalArgumentException(
          s"term_counts expects (text, term STRING literals...), got $other")
      }),
    (FunctionIdentifier("span_digests"),
      info("span_digests",
        "span_digests(text, spanTokens[, withText]) - array of struct(span_no, [span_text,] " +
          "span_digest) for consecutive spanTokens-token spans; md5-hex digests"),
      (args: Seq[Expression]) => args match {
        case Seq(text, n) =>
          SpanDigests(text, intLit(n, "span_digests", "spanTokens"), withText = false)
        case Seq(text, n, Literal(w: Boolean, _)) =>
          SpanDigests(text, intLit(n, "span_digests", "spanTokens"), w)
        case Seq(_, _, w) => throw new IllegalArgumentException(
          s"span_digests: withText must be a BOOLEAN literal, got $w")
        case other => throw new IllegalArgumentException(
          s"span_digests expects (text, spanTokens[, withText literal]), got ${other.size} args")
      }))

  /** Register all kernel functions on an EXISTING session (the
    * extensions class covers sessions not yet built). Idempotent:
    * re-registration overwrites with identical builders. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fnInfo, builder) =>
      GraftFunctionRegistryBridge.register(spark, id, fnInfo, builder)
    }
}
