package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: address arithmetic on known bits, bucket edge
  * behavior, and the actual file-skipping win measured from written
  * parquet — per-file ranges must be tight on BOTH dimensions, unlike
  * a single-column sort. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known bit patterns land at even/odd positions") {
    val df = Seq((3L, 1L), (0L, 0L), (5L, 2L)).toDF("bx", "by")
      .select(Layout.interleave(col("bx"), col("by"), 4).as("z"))
    // (bx=0b11, by=0b01): x bits at 0,2 → 5; y bit at 1 → 2; z = 7
    // (bx=0b101, by=0b010): x → 1 + 16 = 17; y → 8; z = 25
    assert(df.as[Long].collect().toSeq == Seq(7L, 0L, 25L))
  }

  test("zAddress: domain edges bucket to 0 and 2^bits-1; degenerate dim to 0") {
    val df = Seq((0.0, 10.0), (100.0, 10.0), (50.0, 10.0))
      .toDF("x", "y")
    val got = Layout.zAddress(df, "x", "y", bits = 8)
      .select("zx", "zy").as[(Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 255L, 128L))
    assert(got.forall(_._2 == 0L), "constant dimension collapses to bucket 0")
  }

  test("writeZOrdered: every file is tight on BOTH dims; a y-predicate prunes") {
    val n = 4096
    // deterministic uniform-ish 2-D cloud (no Random: bit-reversal fill)
    def rev(i: Int): Int = Integer.reverse(i) >>> 20 // 12-bit reversal
    val rows = (0 until n).map(i => (i.toDouble, rev(i).toDouble))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val zPath = s"$dir/z"
    val xPath = s"$dir/x"
    val df = rows.toDF("x", "y")
    Layout.writeZOrdered(df, zPath, "x", "y", files = 16, bits = 12)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)
    def fileRanges(path: String) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg((max("y") - min("y")).as("yspan"), count(lit(1)).as("cnt"))
      .select("yspan", "cnt").as[(Double, Long)].collect()
    val z = fileRanges(zPath)
    val x = fileRanges(xPath)
    assert(z.length == 16 && x.length == 16)
    assert(z.map(_._2).sum == n && x.map(_._2).sum == n)
    // x-sorted files each span ~the full y domain; z-ordered files span
    // a tile. Mean y-span must shrink by at least 2x (it's ~4x here).
    val zSpan = z.map(_._1).sum / z.length
    val xSpan = x.map(_._1).sum / x.length
    assert(zSpan * 2 < xSpan, s"z mean y-span $zSpan vs x-sorted $xSpan")
    // the pruning consequence: a 10%-of-domain y-slice overlaps few
    // z files (footer stats would skip the rest) but EVERY x-sorted file
    def touched(path: String, lo: Double, hi: Double) = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("y").as("ylo"), max("y").as("yhi"))
      .filter(col("yhi") >= lo && col("ylo") <= hi).count()
    assert(touched(xPath, 2000, 2400) == 16L)
    assert(touched(zPath, 2000, 2400) <= 8L)
  }

  test("rechunkMirror: row order preserved, chunk policy honored, small tables byte-copied") {
    val src = java.nio.file.Files.createTempDirectory("rechunk_src").toString
    val dst = java.nio.file.Files.createTempDirectory("rechunk_dst").toString + "/mirror"
    // a "fact" table written as ONE file/row group, in a known order
    (0 until 60000).map(i => (i.toLong, s"v$i"))
      .toDF("id", "payload")
      .coalesce(1).write.parquet(s"$src/fact.parquet")
    // a small table the policy must copy untouched
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .coalesce(1).write.parquet(s"$src/dim.parquet")
    Layout.rechunkMirror(spark, src, dst)
    // fact: 60000/8192 = 7 chunks, each its own file
    val factFiles = new java.io.File(s"$dst/fact.parquet")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(factFiles == 7, s"expected 7 chunk files, got $factFiles")
    // order preservation: per-file id ranges must not overlap, and the
    // full id sequence must survive exactly
    val ranges = spark.read.parquet(s"$dst/fact.parquet")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"), count(lit(1)).as("n"))
      .select("lo", "hi", "n").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(ranges.map(_._3).sum == 60000L)
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 < lo2, s"file ranges overlap: $hi1 >= $lo2 — order lost")
      case _ =>
    }
    // dim: byte-identical copy (same length as the single source file)
    val srcDim = new java.io.File(s"$src/dim.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val dstDim = new java.io.File(s"$dst/dim.parquet")
      .listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    assert(dstDim == srcDim, "small table must be copied, not rewritten")
    // content equality both tables
    assert(spark.read.parquet(s"$dst/fact.parquet").orderBy("id").collect().toSeq ==
      spark.read.parquet(s"$src/fact.parquet").orderBy("id").collect().toSeq)
    assert(spark.read.parquet(s"$dst/dim.parquet").orderBy("k").collect().toSeq ==
      spark.read.parquet(s"$src/dim.parquet").orderBy("k").collect().toSeq)
  }

  test("rechunkMirror: multi-file source keeps NAME order even when sizes would bin-pack differently") {
    val src = java.nio.file.Files.createTempDirectory("rechunk_mf_src").toString
    val dst = java.nio.file.Files.createTempDirectory("rechunk_mf_dst").toString + "/m"
    // four name-ordered shards with DELIBERATELY non-monotonic sizes:
    // Spark's scan orders splits by size descending, so a bare
    // monotonically_increasing_id would visit part-1 (the biggest)
    // first — the file-ordinal order key must win anyway
    val tdir = new java.io.File(s"$src/t.parquet"); tdir.mkdirs()
    val shardSizes = Seq(2000, 60000, 500, 30000) // ids 0.., name order
    var lo = 0L
    shardSizes.zipWithIndex.foreach { case (n, i) =>
      val df = (lo until lo + n).map(id => (id, s"p$id")).toDF("id", "payload")
      lo += n
      val tmp = java.nio.file.Files.createTempDirectory("shard").toString + "/w"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(tdir, f"part-$i%05d.parquet").toPath)
    }
    graft.operators.Layout.rechunkMirror(spark, src, dst,
      partsFor = (_, _) => 5)
    val ranges = spark.read.parquet(s"$dst/t.parquet")
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("lo"), max("id").as("hi"), count(lit(1)).as("n"))
      .select("lo", "hi", "n").as[(Long, Long, Long)].collect()
      .sortBy(_._1)
    assert(ranges.map(_._3).sum == shardSizes.map(_.toLong).sum)
    // global order preserved ⟺ per-output-file id ranges are disjoint
    // and ascending across the whole source, not just within shards
    ranges.sliding(2).foreach {
      case Array((_, hi1, _), (lo2, _, _)) =>
        assert(hi1 < lo2, s"output ranges overlap: $hi1 >= $lo2 — file order lost")
      case _ =>
    }
  }
}
