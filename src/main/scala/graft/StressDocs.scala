package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale stress for the LLM-data-pipeline family: N synthetic documents
  * (default 200k × ~100 tokens ≈ 20M tokens, 20–40× the sf0.1 bench
  * corpus; pass an arg for more) through the dedup / text-kernel / BPE
  * paths, wall times printed per stage. Generation is distributed
  * (`spark.range` + expression-synthesized text — no driver-side data)
  * and deterministic: every tenth doc reuses an earlier doc's seed, so
  * the corpus has a known 10% exact-duplicate rate for the dedup stages
  * to find, and token text is drawn from a 50k-word synthetic
  * vocabulary so the LSH/BPE vocab tables have realistic cardinality.
  *
  * The corpus also carries a designed NEAR-dup structure: the token
  * body is modular in the seed, so seeds 50 000 apart share all 100
  * body tokens and differ only in the leading seed token (99/101
  * common tokens) — at 200k docs that's ~324k planted near-dup pairs,
  * which the LSH stage must find without the exact-dup stage seeing
  * them (verified: candidate count splits 18k exact + ~324k near).
  *
  * `sbt "runMain graft.StressDocs [docs]"`.
  */
object StressDocs {
  def main(args: Array[String]): Unit = {
    val docs = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stress-docs] ${(System.nanoTime() - t0) / 1e9}%8.2f s  $name")
      r
    }

    // seed: every 10th doc replays doc seed/10 → exact-dup clusters.
    // tokens: 100 per doc from a 50k-word space, position-mixed so
    // adjacent docs share vocabulary but not shingles.
    val corpus = spark.range(docs)
      // integer `div`, not `/`: SQL `/` on longs is DOUBLE division, and
      // a double seed stringifies with a '.0' that leaks into every
      // token ('w123.0'), silently emptying bpeTrain's ^[a-z]+$ vocab
      .withColumn("seed", when(col("id") % 10 === 0, expr("id div 10")).otherwise(col("id")))
      .select(col("id").as("doc_id"),
        // leading seed token makes text a bijection of the seed (the
        // 50k-modular body alone would collide seeds ≡ mod 50000);
        // the body keeps vocabulary cardinality realistic at 50k words
        concat_ws(" ",
          concat(lit("d"), col("seed")),
          concat_ws(" ", transform(sequence(lit(0), lit(99)),
            i => concat(lit("w"), pmod(col("seed") * 31 + i * 7919 + i * i, lit(50000)))))).as("text"))
      .localCheckpoint() // materialize once; stages time their own work, not generation
    println(s"[stress-docs] corpus: ${corpus.count()} docs × 100 tokens")

    timed("exact dedup (digest agg)") {
      val kept = graft.operators.Dedup.exact(corpus).count()
      println(s"[stress-docs]   kept $kept of $docs (expect ~${docs - docs / 10 + docs / 100})")
    }
    timed("TextStats profile (kernel projection + agg)") {
      graft.operators.TextAnalysis.profile(corpus)
        .agg(avg("quality"), sum("approx_bpe_tokens")).head()
    }
    timed("Gopher rule gate (9 published rules, scan -> project)") {
      val kept = graft.operators.TextAnalysis.gopherRules(corpus)
        .filter(col("gopher_keep")).count()
      println(s"[stress-docs]   gopher keeps $kept of $docs")
    }
    timed("MinHash-LSH candidates (16 hashes, 8 bands, capped buckets)") {
      val pairs = graft.operators.Dedup.minHashLshCandidates(
        corpus, n = 2, numHashes = 16, bands = 8).count()
      println(s"[stress-docs]   candidate pairs: $pairs " +
        "(exact-dup clusters + planted 99/101-token near-dups)")
    }
    timed("span census (span_digests kernel + digest agg)") {
      graft.operators.Dedup.duplicatedSpans(corpus).count()
    }
    timed("incremental near-dup, one-shot (1% batch + full index rebuild)") {
      graft.operators.Dedup.incrementalNearDup(
        corpus.filter(col("doc_id") % 100 === 0),
        corpus.filter(col("doc_id") % 100 =!= 0),
        n = 2, numHashes = 16, bands = 8).count()
    }
    val index = timed("near-dup index build (once per ingest epoch)") {
      graft.operators.Dedup.nearDupIndex(
        corpus.filter(col("doc_id") % 100 =!= 0),
        n = 2, numHashes = 16, bands = 8).localCheckpoint()
    }
    timed("incremental near-dup vs PREBUILT index (per-batch marginal cost)") {
      graft.operators.Dedup.incrementalNearDupAgainst(
        corpus.filter(col("doc_id") % 100 === 0), index,
        n = 2, numHashes = 16, bands = 8).count()
    }
    timed("BPE train (4 merges on the word-frequency table)") {
      // synthetic words are 'w<digits>' — not [a-z]+, so train on a
      // letter-mapped projection to exercise the real path
      val alpha = corpus.select(col("doc_id"),
        translate(col("text"), "0123456789", "abcdefghij").as("text"))
      graft.operators.TextAnalysis.bpeTrain(alpha, iters = 4).count()
    }
    timed("per-group exact-k sample (k=1000 over 20 synthetic groups)") {
      graft.operators.Sampling.samplePerGroup(
        corpus.withColumn("grp", pmod(col("doc_id"), lit(20))),
        "doc_id", "grp", k = 1000).count()
    }
    timed("CDC chunk census (cdc_chunks kernel + digest agg)") {
      // exact-dup clusters guarantee recurring chunks at any N
      val dups = graft.operators.Dedup.cdcChunkCensus(corpus).count()
      println(s"[stress-docs]   recurring chunk digests: $dups")
    }
    val ppSlice = corpus.filter(col("doc_id") < 50000)
    val ppSlicePairs = timed("PPJoin exact set-similarity (prefix+length+positional filters, 50k-doc slice)") {
      // exact Jaccard >= 0.9 over 1-gram sets: the synthetic 50k-word
      // vocabulary over 100-token docs gives every body token df ~100
      // at this slice — the worst case for prefix filtering (no rare
      // tokens to hide behind), so this times the length/positional
      // filters under pressure rather than a friendly skew. The slice
      // holds the planted exact-dup clusters (J = 1.0 >= 0.9).
      val pairs = graft.operators.Dedup
        .ppJoinPairs(ppSlice, n = 1, threshold = 0.9).count()
      println(s"[stress-docs]   exact Jaccard>=0.9 pairs in slice: $pairs")
      assert(pairs > 0, "planted exact-dup pairs must surface")
      pairs
    }
    timed("PPJoin self-join replay from stored posting lists (50k-doc slice)") {
      // the x_dedup_ppjoin serving path at 200x bench scale: build the
      // slice's epoch index, group the posting lists, and replay the
      // self-join from them — the pair count must equal the one-shot
      // join's under the same worst-case uniform-df pressure (the
      // storage path loses nothing at stress scale, not just at spec
      // scale)
      val idx = graft.operators.Dedup.ppJoinIndex(ppSlice, n = 1, threshold = 0.9)
      val lists = graft.operators.Dedup.ppJoinPostingLists(idx.postings)
        .localCheckpoint()
      val pairs = graft.operators.Dedup
        .ppJoinPairsFromIndex(idx, Some(lists)).count()
      println(s"[stress-docs]   replayed pairs from stored lists: $pairs")
      assert(pairs == ppSlicePairs,
        s"index replay must equal the one-shot join ($pairs vs $ppSlicePairs)")
    }
    val ppIdx = timed("PPJoin epoch index build (df window + prefix postings, 99% corpus)") {
      // same worst-case rarity profile as the slice stage: every body
      // token df ~400 at 198k docs over the 50k vocab, so prefix
      // postings are uniformly fat and the screen's length/positional
      // filters do the work. Batch residue 1 (not 0): a %100==0 doc's
      // seed is ≡0 mod 10, so its exact clone AND its +50000 body
      // partner are both replay docs with different seeds — that split
      // plants nothing. Residue-1 docs d < 20000 have their exact
      // clone at id 10·d (which replays seed d) in the corpus.
      val i = graft.operators.Dedup.ppJoinIndex(
        corpus.filter(col("doc_id") % 100 =!= 1), n = 1, threshold = 0.9)
      i.copy(dfTable = i.dfTable.localCheckpoint(),
        postings = i.postings.localCheckpoint())
    }
    timed("incremental exact screen vs PREBUILT index (1% batch, per-batch marginal cost)") {
      val out = graft.operators.Dedup.ppJoinAgainst(
        corpus.filter(col("doc_id") % 100 === 1), ppIdx)
      val exact = out.filter(col("jaccard") === 1.0).count()
      val pairs = out.count()
      println(s"[stress-docs]   exact Jaccard>=0.9 batch<->corpus pairs: $pairs ($exact at J=1.0; expect ~${docs / 1000} planted clones)")
      assert(exact > 0, "planted batch->corpus exact clones must surface")
    }
    timed("BM25 top-100 (3-term query over the full corpus)") {
      // query three body words guaranteed present by the modular vocab
      graft.operators.TextAnalysis.bm25TopK(corpus,
        Seq("w100", "w2500", "w47000"), k = 100).count()
    }
    timed("NB classify (TokenHashCounts + NbScores model-in-expression)") {
      // 20 synthetic source labels; the r8 serving shape end-to-end at
      // 200x bench scale: per-row kernel term frequencies, one
      // (class, token) model aggregate, one scoring projection — the
      // 50k-token vocab x 20 classes model rides inside the expression
      val labeled = corpus.withColumn("source",
        concat(lit("s"), pmod(col("doc_id"), lit(20))))
      val out = graft.operators.TextAnalysis.nbClassify(labeled)
      val n = out.count()
      println(s"[stress-docs]   scored $n docs against the 20-class model")
    }
    timed("DSIR importance weights (TokenHashLogRatio serving kernel)") {
      // every 20th doc is the trusted seed set; the r9 serving shape
      // end-to-end at 200x bench scale: per-row kernel term
      // frequencies, ONE conditional vocab aggregate for both LMs, the
      // 50k-entry term map collected once and scored back as a
      // broadcast projection — no (doc, token) join at any point
      val w = graft.operators.TextAnalysis.importanceWeights(
        corpus, pmod(col("doc_id"), lit(20)) === 0)
      val agg = w.agg(count(lit(1)).as("n"),
        sum(when(col("log_ratio").isNotNull, 1L).otherwise(0L)).as("scored"),
        avg(when(col("is_target"), col("log_ratio"))).as("tgt_mean"),
        avg(when(!col("is_target"), col("log_ratio"))).as("rest_mean")).head()
      require(!agg.isNullAt(2) && !agg.isNullAt(3),
        "both the seed set and its complement must contain scored docs " +
          s"(scored ${agg.getLong(1)} of ${agg.getLong(0)})")
      require(agg.getDouble(2) >= agg.getDouble(3),
        "target docs must not score below the rest under their own LM")
      println(s"[stress-docs]   ${agg.getLong(1)} of ${agg.getLong(0)} docs scored; " +
        f"target mean ${agg.getDouble(2)}%.4f vs rest ${agg.getDouble(3)}%.4f")
    }
    timed("Count-Min sketch (4x1024 matrix over the token stream)") {
      corpus.select(explode(split(col("text"), " ")).as("token"))
        .agg(graft.functions.CountMinSketch(col("token"), 4, 1024)).head()
    }
    timed("weighted per-group sample (n-chars-weighted, k=1000)") {
      graft.operators.Sampling.sampleWeightedPerGroup(
        corpus.withColumn("grp", pmod(col("doc_id"), lit(20)))
          .withColumn("w", length(col("text")).cast("double")),
        "doc_id", "w", "grp", k = 1000).count()
    }
    timed("z-order write + footer-pruning audit (morton kernel, 64 files)") {
      // layout the corpus on (doc_id, n_chars); the audit re-reads the
      // files and measures how many a 10%-band n_chars predicate would
      // prune from footer stats alone — the at-scale proof of the
      // LayoutSpec property
      val dir = java.nio.file.Files.createTempDirectory("stress_zorder").toString
      val sized = corpus.withColumn("n_chars", length(col("text")).cast("double"))
        .withColumn("idd", col("doc_id").cast("double"))
      graft.operators.Layout.writeZOrdered(sized, dir, "idd", "n_chars", files = 64)
      val stats = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
        .localCheckpoint()
      val total = stats.count()
      val b = stats.agg(min("lo"), max("hi")).head()
      val (blo, bhi) = (b.getDouble(0), b.getDouble(1))
      val qlo = blo + (bhi - blo) * 0.45
      val qhi = blo + (bhi - blo) * 0.55
      val touched = stats.filter(col("hi") >= qlo && col("lo") <= qhi).count()
      println(s"[stress-docs]   10% n_chars band touches $touched of $total files")
    }
    // REAL codec loop at stress scale: the image family's 100 TB story
    // is per-asset codec work that parallelizes embarrassingly — the
    // encode+decode+dHash chain is projection-shaped (mapPartitions,
    // zero shuffle), so wall scales with assets/cores. Planted sibling
    // structure (2q/2q+1) exactly as in the bench queries.
    val imgAssets = math.min(docs / 2, 100000L)
    timed(s"image codec loop ($imgAssets PNGs: render→encode→decode→dHash)") {
      val dh = graft.operators.Multimodal.imageDHash(
        graft.operators.Multimodal.renderPng(
          spark.range(imgAssets).select(col("id").as("asset_id"))))
        .localCheckpoint()
      val n = dh.count()
      assert(n == imgAssets, s"every asset must decode, got $n")
      // explicit maxBucket ≥ slice, kept from the r15 fix: the pixel
      // formula's hash-mixed offsets (r16) make base images effectively
      // unique so band buckets are small again, but an uncapped screen
      // keeps this assert a pure RECALL test — the pigeonhole
      // guarantee — independent of the render formula's duplicate
      // density.
      // clamp: hammingNearDup64 requires maxBucket > 1, and at tiny
      // asset counts ndSlice + 1 can be <= 1 (ADVICE r17); clamp the
      // LONG before narrowing so a >2^31 slice saturates instead of
      // wrapping negative into a silently tiny cap
      val ndSlice = imgAssets / 5
      val nd = timed(s"  dHash hamming near-dup over $ndSlice assets (5 tight bit-bands)") {
        graft.operators.Dedup.hammingNearDup64(
          dh.filter(col("asset_id") < ndSlice), maxHamming = 4,
          maxBucket = math.max(2L, math.min(ndSlice + 1, Int.MaxValue.toLong)).toInt)
          .localCheckpoint()
      }
      val sib = nd.filter(col("id_b") === col("id_a") + 1 && pmod(col("id_a"), lit(2)) === 0)
        .count()
      println(s"[stress-docs]   sibling near-dups found: $sib of ${imgAssets / 10} planted")
      assert(sib == imgAssets / 10, "every planted sibling pair must surface")
    }
    timed(s"audio codec loop ($imgAssets WAVs: synth→encode→decode→stats)") {
      val feats = graft.operators.Multimodal.decodeAudioFeatures(
        graft.operators.Multimodal.renderWav(
          spark.range(imgAssets).select(col("id").as("asset_id")), nSamples = 512))
      val bad = feats.filter(col("n_samples").isNull || col("n_samples") =!= 512L).count()
      assert(bad == 0, s"every WAV must decode to 512 samples, $bad failed")
    }
    // Video near-dup tier at stress scale (r17): multi-frame GIF
    // render → stride-2 sampled decode → temporal-mean dHash → banded
    // Hamming screen. Same projection shape as the image loop (the
    // only shuffle is the near-dup banding), 8 frames per asset so the
    // per-asset codec work is ~8× an image's — scale the asset count
    // down accordingly.
    val vidAssets = math.min(docs / 8, 25000L)
    timed(s"video codec loop ($vidAssets 8-frame GIFs: render→encode→sampled decode→dHash)") {
      val dh = graft.operators.Multimodal.videoDHash(
        graft.operators.Multimodal.renderGif(
          spark.range(vidAssets).select(col("id").as("asset_id"))), stride = 2)
        .localCheckpoint()
      val n = dh.filter(col("dhash_hi").isNotNull).count()
      assert(n == vidAssets, s"every asset must decode and fingerprint, got $n")
      val ndSlice = vidAssets / 5
      val nd = timed(s"  video hamming near-dup over $ndSlice assets (7 tight bit-bands)") {
        graft.operators.Dedup.hammingNearDup64(
          dh.filter(col("asset_id") < ndSlice), maxHamming = 6,
          maxBucket = math.max(2L, math.min(ndSlice + 1, Int.MaxValue.toLong)).toInt)
          .localCheckpoint()
      }
      val sib = nd.filter(col("id_b") === col("id_a") + 1 && pmod(col("id_a"), lit(2)) === 0)
        .count()
      val planted = ndSlice / 2
      println(s"[stress-docs]   sibling near-dups found: $sib of $planted planted")
      // radius 6 vs the measured sibling distribution (0–5 at sf0.01):
      // the 4×4 corner perturbation on 16×16 frames can reach 6 bits in
      // the tail, so assert high-but-not-exact recall — the uncapped
      // screen keeps this a pure pigeonhole-recall test either way
      assert(sib >= planted * 97 / 100,
        s"video sibling recall too low: $sib of $planted")
    }
    spark.stop()
  }
}
