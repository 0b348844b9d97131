package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.12 X5): media payloads as
  * opaque `BinaryType` columns alongside a typed metadata struct, with
  * decode / feature-extract / resize / frame-sample stages.
  *
  * Two decode tiers:
  *
  *  - REAL image codec path (r15): the JDK ships `javax.imageio`
  *    (PNG/JPEG/BMP), so [[renderPng]] / [[decodeImageFeatures]] /
  *    [[imageDHash]] run an actual encode→decode loop — PNG is
  *    lossless, so decoded pixel statistics of a deterministically
  *    rendered image are engine-independent facts a SQL oracle can
  *    recompute from the pixel formula without any codec: a hash match
  *    proves the whole codec round trip end-to-end.
  *  - STUB tier for formats whose codecs are genuinely absent here
  *    (audio/video): deterministic fakes, clearly marked below, with
  *    the Spark-side plumbing (schema, binary columns,
  *    partition-preserving `mapPartitions` batch shape — the Scala
  *    analog of `mapInPandas`) real and tested.
  */
object Multimodal {

  /** Deterministic RGB test pattern: the pixel value formula shared by
    * the renderer and the SQL oracle. Asset 2q and 2q+1 render the
    * SAME base image (keyed by q = id div 2) except a small red
    * perturbation in the 4×4 corner of the odd sibling — the planted
    * near-duplicate structure the dHash pipeline must recover. All
    * integer math, all non-negative.
    *
    * The per-channel base offset is a hash-like mix of q (multiply by a
    * large odd constant modulo a channel-specific prime, then mod 256)
    * rather than the r15 linear `q * c % 256`: the linear form made
    * base images PERIODIC in q mod 256, so a corpus of N assets held
    * N/512 exact copies of every image and the near-dup pair space grew
    * quadratically with N — a synthetic-duplicate artifact, not
    * operator workload. With the mixed offsets the three channels
    * collide together with probability ~256^-3 per pair (birthday:
    * ~0.2 accidental duplicate base pairs at 5k assets, ~19 at 50k), so
    * planted sibling pairs — and therefore near-dup output — grow
    * LINEARLY in corpus size, which is what the 10× scale-up protocol
    * needs to compare volumes rather than duplicate densities. */
  def pixelR(a: Long, x: Int, y: Int): Int =
    (((a / 2 % 999983L) * 2654435761L % 999983L % 256 + x * 13 + y * 31 + x * y
      + (if (a % 2 == 1 && x < 4 && y < 4) 41 else 0)) % 256).toInt
  def pixelG(a: Long, x: Int, y: Int): Int =
    (((a / 2 % 999979L) * 2246822519L % 999979L % 256 + x * 3 + y * 17 + 2 * x * y) % 256).toInt
  def pixelB(a: Long, x: Int, y: Int): Int =
    (((a / 2 % 999961L) * 3266489917L % 999961L % 256 + x * 19 + y * 23 + 3 * x * y) % 256).toInt

  /** Image codec plumbing resolved ONCE per partition (r16): the
    * `ImageIO` static entry points (`write`, `read`,
    * `createImageInput/OutputStream`) each re-scan the IIORegistry per
    * CALL — at one call per ROW the registry scans dominated the codec
    * stages (the same per-call provider cost the WAV path hoisted in
    * r15). Providers resolve here once; per-row reader/writer INSTANCES
    * stay per row (they hold mutable stream state and cost one
    * constructor), and streams wrap the byte arrays directly
    * (`MemoryCacheImageInput/OutputStream`) with no registry visit. */
  private def writerSpiFor(format: String): javax.imageio.spi.ImageWriterSpi = {
    val it = javax.imageio.ImageIO.getImageWritersByFormatName(format)
    if (it.hasNext) it.next().getOriginatingProvider else null
  }
  private def readerSpiFor(format: String): javax.imageio.spi.ImageReaderSpi = {
    val it = javax.imageio.ImageIO.getImageReadersByFormatName(format)
    if (it.hasNext) it.next().getOriginatingProvider else null
  }

  /** REAL codec path, encode half: render each asset id's deterministic
    * test pattern and ENCODE it through the JDK's PNG writer — the
    * payload bytes in the output are genuine PNG. mapPartitions so the
    * codec setup (the PNG writer provider) is per-batch, not per-row;
    * pixels land via ONE bulk setRGB per image (identical stored
    * values to the per-pixel calls — same ColorModel path). */
  def renderPng(ids: DataFrame, w: Int = 32, h: Int = 32,
      idCol: String = "asset_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      val spi = writerSpiFor("png")
      val px = new Array[Int](w * h)
      rows.map { r =>
        val a = r.getLong(0)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            px(y * w + x) =
              (pixelR(a, x, y) << 16) | (pixelG(a, x, y) << 8) | pixelB(a, x, y)
            x += 1
          }
          y += 1
        }
        img.setRGB(0, 0, w, h, px, 0, w)
        val out = new java.io.ByteArrayOutputStream()
        if (spi != null) {
          val writer = spi.createWriterInstance()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          try {
            writer.setOutput(ios)
            writer.write(null, new javax.imageio.IIOImage(img, null, null), null)
          } finally {
            writer.dispose()
            ios.close()
          }
        } else javax.imageio.ImageIO.write(img, "png", out)
        Row(a, out.toByteArray, Row("image/png", w, h, 1))
      }
    }(enc)
  }

  /** REAL codec path, decode half: `javax.imageio` decodes the payload
    * and the features are EXACT integer channel sums — PNG is lossless,
    * so on [[renderPng]] output these equal the pixel-formula sums a
    * SQL oracle computes with no codec at all. Null/undecodable
    * payloads yield a null feature row rather than killing the stage
    * (codec errors are data errors at 100 TB, not job errors). */
  def decodeImageFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_r", LongType),
      StructField("sum_g", LongType),
      StructField("sum_b", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select("asset_id", "media").mapPartitions { rows =>
      val spi = readerSpiFor("png")
      rows.map { r =>
        val a = r.getLong(0)
        val img = decodeImage(r.getAs[Array[Byte]]("media"), spi)
        if (img == null) Row(a, null, null, null, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          // ONE bulk getRGB per image: same per-pixel values as the
          // per-call form (same ColorModel conversion), none of the
          // per-call overhead
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
            i += 1
          }
          Row(a, w, h, sr, sg, sb)
        }
      }
    }(enc)
  }

  /** Decode one payload through a hoisted reader provider (falling back
    * to the registry-scanning `ImageIO.read` only when the provider was
    * absent); undecodable payloads yield null — data errors, not job
    * errors. */
  private def decodeImage(bytes: Array[Byte],
      spi: javax.imageio.spi.ImageReaderSpi): java.awt.image.BufferedImage =
    try {
      if (spi != null) {
        val reader = spi.createReaderInstance()
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          reader.setInput(iis)
          reader.read(0)
        } finally {
          reader.dispose()
          iis.close()
        }
      } else javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    } catch { case _: Exception => null }

  /** Difference hash (dHash) over DECODED pixels — the standard cheap
    * perceptual image fingerprint: integer grayscale, integer
    * box-average onto a (hw+1)×hh grid, one bit per horizontally
    * adjacent cell pair. Everything is integer division on decoded
    * values, so the 64-bit hash (returned as two non-negative 32-bit
    * halves — portable to engines whose BIGINT shifts reject bit 63)
    * is an exact, SQL-replicable function of the pixels: the oracle
    * recomputes it from the render formula and a hash match pins the
    * codec loop AND the hash math. Near-dup images differ in a few
    * bits; see [[graft.operators.Dedup.hammingNearDup64]]. */
  def imageDHash(assets: DataFrame, hw: Int = 8, hh: Int = 8): DataFrame = {
    // hh must be EVEN: the packing below splits rows at hh/2 into the
    // hi/lo 32-bit halves (bit index (j % (hh/2))*hw + i), so an odd
    // hh — e.g. the otherwise-64-bit grid hw=64,hh=1 — would divide by
    // zero / pack unevenly. Even hh with hw*hh == 64 gives exactly
    // 32 bits per half.
    require(hw >= 1 && hh >= 2 && hh % 2 == 0 && hw * hh == 64,
      "dHash grid must pack 64 bits into two 32-bit halves: hw*hh == 64 with even hh")
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select("asset_id", "media").mapPartitions { rows =>
      val spi = readerSpiFor("png")
      rows.map { r =>
        val a = r.getLong(0)
        val img = decodeImage(r.getAs[Array[Byte]]("media"), spi)
        if (img == null) Row(a, null, null)
        else {
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          // integer grayscale plane, then the shared grid/bit math
          val gray = new Array[Long](px.length)
          var i = 0
          while (i < px.length) {
            val p = px(i)
            gray(i) = (299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF)
              + 114L * (p & 0xFF)) / 1000L
            i += 1
          }
          val (hi, lo) = dhash64(gray, w, h, hw, hh)
          Row(a, hi, lo)
        }
      }
    }(enc)
  }

  /** Shared dHash grid/bit math over a per-pixel integer intensity
    * plane: integer box-average onto a (hw+1)×hh grid, one bit per
    * horizontally adjacent cell pair, packed as two non-negative
    * 32-bit halves (bit `(j % (hh/2))*hw + i`, rows below hh/2 in the
    * hi half). The plane may hold per-image gray ([[imageDHash]]) or
    * MULTI-FRAME gray sums ([[videoDHash]]) — dHash only compares cell
    * averages, so any per-pixel integer accumulation keeps every step
    * exact integer math a SQL oracle replays verbatim. */
  private def dhash64(vals: Array[Long], w: Int, h: Int,
      hw: Int, hh: Int): (Long, Long) = {
    val cols = hw + 1
    val avg = Array.ofDim[Long](cols, hh)
    var ci = 0
    while (ci < cols) {
      val x0 = ci * w / cols; val x1 = (ci + 1) * w / cols
      var cj = 0
      while (cj < hh) {
        val y0 = cj * h / hh; val y1 = (cj + 1) * h / hh
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            s += vals(y * w + x)
            n += 1; x += 1
          }
          y += 1
        }
        avg(ci)(cj) = if (n == 0) 0L else s / n
        cj += 1
      }
      ci += 1
    }
    var hi = 0L; var lo = 0L
    var j = 0
    while (j < hh) {
      var i = 0
      while (i < hw) {
        if (avg(i)(j) < avg(i + 1)(j)) {
          val bit = 1L << ((j % (hh / 2)) * hw + i)
          if (j < hh / 2) hi |= bit else lo |= bit
        }
        i += 1
      }
      j += 1
    }
    (hi, lo)
  }

  /** Deterministic 16-bit PCM test signal: the sample formula shared by
    * the WAV renderer and the SQL oracle. Integer math into the full
    * signed-16 range; the quadratic-residue term breaks periodicity so
    * zero crossings and amplitude stats vary per asset. */
  def pcmSample(a: Long, t: Int): Int =
    ((((a / 2) * 37 + t.toLong * 113 + (t.toLong * t % 97) * 5
      + (if (a % 2 == 1 && t < 16) 257 else 0)) % 65536) - 32768).toInt

  /** REAL audio codec path, encode half: synthesize each asset's
    * deterministic PCM signal and ENCODE through the JDK's WAV writer
    * (`javax.sound.sampled` — 16-bit signed little-endian mono).
    * PCM-in-WAV is lossless, so decoded sample statistics are
    * engine-independent facts of the formula. */
  def renderWav(ids: DataFrame, nSamples: Int = 2048, sampleRate: Float = 8000f,
      idCol: String = "asset_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
      // codec setup ONCE per partition (the mapPartitions contract):
      // AudioSystem.write scans the provider registry per call, which
      // at one call per row dominated the stage — resolve the WAVE
      // writer through the public SPI here and reuse it for the batch
      val writer = {
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileWriter]).iterator()
        var w: javax.sound.sampled.spi.AudioFileWriter = null
        while (w == null && it.hasNext) {
          val c = it.next()
          if (c.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE)) w = c
        }
        w
      }
      rows.map { r =>
        val a = r.getLong(0)
        val pcm = new Array[Byte](nSamples * 2)
        var t = 0
        while (t < nSamples) {
          val s = pcmSample(a, t)
          pcm(2 * t) = (s & 0xFF).toByte
          pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
          t += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
        val out = new java.io.ByteArrayOutputStream()
        if (writer != null)
          writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        else
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Row(a, out.toByteArray, Row("audio/wav", nSamples, 1, 1))
      }
    }(enc)
  }

  /** REAL audio codec path, decode half: `AudioSystem` parses the WAV
    * container and the features are exact integer signal statistics —
    * sample count, Σ|s|, max |s|, and zero crossings (sign flips
    * between consecutive samples, sign(s) = s < 0). On [[renderWav]]
    * output these equal the formula statistics a SQL oracle computes
    * with no codec. Undecodable payloads yield a null row. */
  def decodeAudioFeatures(assets: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("max_abs", LongType),
      StructField("zero_crossings", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assets.select("asset_id", "media").mapPartitions { rows =>
      // codec setup ONCE per partition, like the writer side:
      // AudioSystem.getAudioInputStream re-scans the reader registry
      // per call — resolve the readers through the public SPI here
      val readers = {
        val it = java.util.ServiceLoader
          .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
        val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
        while (it.hasNext) b += it.next()
        b.result()
      }
      def open(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream = {
        val rs = readers.iterator
        while (rs.hasNext) {
          try return rs.next().getAudioInputStream(new java.io.ByteArrayInputStream(bytes))
          catch { case _: Exception => () }
        }
        javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
      }
      rows.map { r =>
        val a = r.getLong(0)
        val parsed =
          try {
            val ais = open(r.getAs[Array[Byte]]("media"))
            try {
              val bytes = ais.readAllBytes()
              val f = ais.getFormat
              if (f.getSampleSizeInBits != 16 || f.getChannels != 1 || f.isBigEndian) null
              else bytes
            } finally ais.close() // stream-hygiene parity with the image/video decoders
          } catch { case _: Exception => null }
        if (parsed == null) Row(a, null, null, null, null)
        else {
          val n = parsed.length / 2
          var sumAbs = 0L; var maxAbs = 0L; var zc = 0L
          var prevNeg = false
          var t = 0
          while (t < n) {
            val s = ((parsed(2 * t) & 0xFF) | (parsed(2 * t + 1) << 8)).toShort.toInt
            val abs = math.abs(s.toLong)
            sumAbs += abs
            if (abs > maxAbs) maxAbs = abs
            val neg = s < 0
            if (t > 0 && neg != prevNeg) zc += 1
            prevNeg = neg
            t += 1
          }
          Row(a, n.toLong, sumAbs, maxAbs, zc)
        }
      }
    }(enc)
  }

  /** Deterministic grayscale video test pattern: the frame pixel
    * formula shared by the GIF renderer and the SQL oracle. Asset 2q
    * and 2q+1 render the SAME animation (keyed by q = id div 2) except
    * a small perturbation in the 4×4 corner of every frame of the odd
    * sibling — the planted near-duplicate structure the video
    * fingerprint pipeline ([[videoDHash]]) must recover, mirroring
    * [[pixelR]]'s image siblings.
    *
    * The per-(q, frame) mix hash-mixes AFTER the frame term folds in
    * (multiply by a large odd constant modulo a prime, THEN reduce):
    * the r16 form mixed q first and only added `f * 7919` afterwards,
    * which made the base `≡ (m + 239·f) mod 256` for the ~94% of
    * assets whose inner sum stays below the prime — the whole 8-frame
    * animation was determined by one byte of m, so a 5k-asset corpus
    * held only ~256 distinct videos. The mixed value feeds THREE
    * independent bytes/nibbles: a constant offset AND two per-asset
    * GRADIENT coefficients on the x/y terms. The gradients matter for
    * the fingerprint tier: with a constant offset alone, two unrelated
    * assets' frames differ by a per-frame constant, which difference
    * hashing cancels by construction (only mod-256 wrap boundaries
    * distinguished them — measured: 0.26% of ALL pairs landed within
    * Hamming 6, a quadratically growing accident rate). Per-asset
    * gradients change adjacent-cell differences directly, so unrelated
    * fingerprints decorrelate structurally and near-dup output grows
    * LINEARLY with corpus size (sibling pairs only) — the video analog
    * of the image formula's r16 de-periodization. All integer math,
    * all non-negative, values in 0..255 — exactly one GIF palette. */
  def framePixel(a: Long, f: Int, x: Int, y: Int): Int = {
    val mix = ((a / 2 % 999959L) * 1099087573L + f * 7919L) % 999959L *
      2654435761L % 999959L
    ((mix % 256
      + x * (13 + mix / 256 % 16) + y * (31 + mix / 4096 % 16) + x * y
      + (if (a % 2 == 1 && x < 4 && y < 4) 41 else 0)) % 256).toInt
  }

  /** REAL video-container codec path, encode half: render each asset's
    * deterministic multi-frame grayscale animation and ENCODE it
    * through the JDK's GIF writer as ONE animated-GIF payload
    * (`ImageWriter.writeToSequence`). GIF's LZW coding is lossless and
    * its palette holds 256 entries — an 8-bit grayscale frame maps
    * bijectively onto the palette — so the decoded frames are
    * bit-exact: per-frame statistics are engine-independent facts of
    * [[framePixel]] that a SQL oracle recomputes with no codec. The
    * GIF ImageWriterSpi is resolved ONCE per partition (the same
    * provider-registry-rescan hoist as the WAV path); writer instances
    * are per row because an ImageWriter holds mutable output state. */
  def renderGif(ids: DataFrame, w: Int = 16, h: Int = 16, nFrames: Int = 8,
      idCol: String = "asset_id"): DataFrame = {
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("media", BinaryType),
      StructField("meta", metaSchema)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    ids.select(col(idCol).cast("long").as("asset_id")).mapPartitions { rows =>
      val spi = {
        val it = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
        if (it.hasNext) it.next().getOriginatingProvider else null
      }
      rows.map { r =>
        val a = r.getLong(0)
        val out = new java.io.ByteArrayOutputStream()
        val writer =
          if (spi != null) spi.createWriterInstance()
          else javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        // direct stream wrapper — ImageIO.createImageOutputStream
        // re-scans the IIORegistry per call
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
        try {
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            // TYPE_BYTE_GRAY stores one byte per pixel row-major: fill
            // the backing array directly (same stored samples as
            // per-pixel setSample, none of the per-call overhead)
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                data(y * w + x) = framePixel(a, f, x, y).toByte
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally {
          writer.dispose()
          ios.close()
        }
        Row(a, out.toByteArray, Row("image/gif", w, h, nFrames))
      }
    }(enc)
  }

  /** REAL video-container codec path, decode half: the JDK's GIF reader
    * parses the animated payload; `read(i)` is random-access per frame,
    * so `stride > 1` is TRUE frame sampling — skipped frames are never
    * decoded (the frames here are full replacements, not deltas), which
    * is the work-skipping contract a 100 TB video pipeline needs.
    * Features are exact integer per-frame statistics (Σ gray, max gray)
    * read through the palette, so on [[renderGif]] output they equal
    * the [[framePixel]] sums a SQL oracle computes codec-free.
    * Undecodable payloads yield one null row (data errors, not job
    * errors). The GIF ImageReaderSpi is resolved once per partition.
    *
    * Frame count comes from the `meta.n_frames` column when the input
    * carries the [[metaSchema]] struct — this is exactly what the
    * typed-metadata contract is FOR: `ImageReader.getNumImages(true)`
    * must scan the whole byte sequence just to count frames, which
    * defeats the point of sampling. Inputs without the meta column (or
    * with a null count) fall back to the counting scan. Metadata
    * trust is one-sided: an OVER-counting `n_frames` surfaces as a
    * null row (the `read(f)` failure path), but an UNDER-count
    * silently truncates — trailing frames are simply never requested,
    * which is indistinguishable from deliberate sampling. Treat
    * `n_frames` as authoritative only from a trusted ingest (e.g.
    * [[renderGif]] output); pass a meta-less frame or null count to
    * force the counting scan otherwise. */
  def decodeVideoFeatures(assets: DataFrame, stride: Int = 1): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("frame_no", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sum_gray", LongType),
      StructField("max_gray", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val hasMeta = assets.schema.fieldNames.contains("meta") &&
      assets.schema("meta").dataType.isInstanceOf[StructType] &&
      assets.schema("meta").dataType.asInstanceOf[StructType]
        .fieldNames.contains("n_frames")
    val in =
      if (hasMeta)
        assets.select(col("asset_id"), col("media"),
          col("meta.n_frames").cast("int").as("__nf"))
      else
        assets.select(col("asset_id"), col("media"),
          lit(null).cast("int").as("__nf"))
    in.mapPartitions { rows =>
      val spi = {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        if (it.hasNext) it.next().getOriginatingProvider else null
      }
      rows.flatMap { r =>
        val a = r.getLong(0)
        // reader construction INSIDE the try: the registry-scan
        // fallback's .next() throws NoSuchElementException when no GIF
        // reader exists at all, and that must surface as the per-row
        // null data-error row, not escape and kill the stage
        var reader: javax.imageio.ImageReader = null
        var iis: javax.imageio.stream.MemoryCacheImageInputStream = null
        try {
          reader =
            if (spi != null) spi.createReaderInstance()
            else javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          // direct stream wrapper — ImageIO.createImageInputStream
          // re-scans the IIORegistry per call
          iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media")))
          reader.setInput(iis)
          val n = if (!r.isNullAt(2)) r.getInt(2) else reader.getNumImages(true)
          (0 until n by stride).map { f =>
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            // ONE bulk getRGB per frame: identical per-pixel values
            // (same palette/ColorModel conversion), none of the
            // per-call overhead
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sum = 0L
            var max = 0
            var i = 0
            while (i < px.length) {
              val g = px(i) & 0xFF
              sum += g
              if (g > max) max = g
              i += 1
            }
            Row(a, f, w, h, sum, max)
          }
        } catch {
          case _: Exception => Seq(Row(a, null, null, null, null, null))
        } finally {
          if (reader != null) reader.dispose()
          // the stream's memory cache is released by close(), not by
          // reader.dispose() — leaving it to GC pins the cache
          // (ADVICE r16)
          if (iis != null) iis.close()
        }
      }
    }(enc)
  }

  /** 64-bit perceptual VIDEO fingerprint through the real container
    * codec: decode every `stride`-th frame of the animated-GIF payload
    * (random-access `read(i)` — skipped frames are never decoded, the
    * same work-skipping contract as [[decodeVideoFeatures]]),
    * accumulate the per-pixel integer gray SUM across the sampled
    * frames, and difference-hash the summed plane on the standard
    * 9×8 grid ([[imageDHash]]'s math, shared via the `dhash64`
    * helper). Temporal-mean hashing is the classic cheap video
    * fingerprint: a small per-frame perturbation moves a few summed
    * cells, so near-duplicate VIDEOS (e.g. [[framePixel]]'s planted
    * 2q/2q+1 siblings) land within a few Hamming bits and feed
    * [[graft.operators.Dedup.hammingNearDup64]] /
    * [[graft.operators.Dedup.hammingScreen64]] unchanged — the video
    * modality gets the image tier's whole near-dup stack for the cost
    * of one fingerprint column.
    *
    * Every step is integer math on losslessly decoded values
    * ([[imageDHash]]'s 299/587/114 integer luma summed across frames,
    * integer box averages, one comparison bit per adjacent cell
    * pair), so the hash is an exact SQL-replicable function of the
    * frame pixels — the oracle recomputes it from the render formula
    * and a hash match pins the multi-frame codec loop AND the fold.
    * Frame count comes from `meta.n_frames` exactly as in
    * [[decodeVideoFeatures]] (same trust contract); undecodable
    * payloads, frame-size mismatches, and zero sampled frames yield a
    * null fingerprint row — data errors, not job errors. */
  def videoDHash(assets: DataFrame, stride: Int = 1,
      hw: Int = 8, hh: Int = 8): DataFrame = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    require(hw >= 1 && hh >= 2 && hh % 2 == 0 && hw * hh == 64,
      "dHash grid must pack 64 bits into two 32-bit halves: hw*hh == 64 with even hh")
    val schema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("dhash_hi", LongType),
      StructField("dhash_lo", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val hasMeta = assets.schema.fieldNames.contains("meta") &&
      assets.schema("meta").dataType.isInstanceOf[StructType] &&
      assets.schema("meta").dataType.asInstanceOf[StructType]
        .fieldNames.contains("n_frames")
    val in =
      if (hasMeta)
        assets.select(col("asset_id"), col("media"),
          col("meta.n_frames").cast("int").as("__nf"))
      else
        assets.select(col("asset_id"), col("media"),
          lit(null).cast("int").as("__nf"))
    in.mapPartitions { rows =>
      val spi = {
        val it = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
        if (it.hasNext) it.next().getOriginatingProvider else null
      }
      rows.map { r =>
        val a = r.getLong(0)
        var reader: javax.imageio.ImageReader = null
        var iis: javax.imageio.stream.MemoryCacheImageInputStream = null
        try {
          reader =
            if (spi != null) spi.createReaderInstance()
            else javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("media")))
          reader.setInput(iis)
          val n = if (!r.isNullAt(2)) r.getInt(2) else reader.getNumImages(true)
          var sum: Array[Long] = null
          var w = 0; var h = 0
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            if (sum == null) {
              w = img.getWidth; h = img.getHeight
              sum = new Array[Long](w * h)
            } else require(img.getWidth == w && img.getHeight == h,
              "frame size mismatch")
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            // same 299/587/114 integer luma as [[imageDHash]] — exact
            // identity on grayscale frames (r=g=b ⇒ 1000v/1000 = v, so
            // the grayscale-GIF oracle replay is unchanged), and the
            // correct intensity for color input (ADVICE r17: the old
            // `& 0xFF` read the blue channel only)
            var i = 0
            while (i < px.length) {
              val p = px(i)
              sum(i) += (299L * ((p >> 16) & 0xFF) + 587L * ((p >> 8) & 0xFF)
                + 114L * (p & 0xFF)) / 1000L
              i += 1
            }
            f += stride
          }
          if (sum == null) Row(a, null, null)
          else {
            val (hi, lo) = dhash64(sum, w, h, hw, hh)
            Row(a, hi, lo)
          }
        } catch {
          case _: Exception => Row(a, null, null)
        } finally {
          if (reader != null) reader.dispose()
          if (iis != null) iis.close()
        }
      }
    }(enc)
  }

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
