package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a typed imperative aggregate:
  * a bounded `k`-counter summary of a (typically enormous) token
  * stream, with the classic frequency guarantees —
  *
  *  - any token with true frequency `> n/(k+1)` IS in the summary;
  *  - for a summary entry, `est ≤ true ≤ est + slack` where
  *    `slack = (n − M)/(k+1)`, `n` = items processed, `M` = sum of
  *    summary counters;
  *  - for an absent token, `true ≤ slack`.
  *
  * Scale shape: this is the constant-state alternative to the full
  * `groupBy(token).count()` term table — each map task keeps ≤ `k`
  * counters regardless of input size, the partial-aggregate shuffle
  * carries ≤ `k` entries per task (not the vocabulary), and merges use
  * the mergeable-summaries rule (add counters, subtract the (k+1)-th
  * largest, drop non-positives — Agarwal et al., PODS'12). The final
  * single-task merge reads k·partitions entries; at extreme partition
  * counts interpose a `repartition`-ed partial merge.
  *
  * The summary's counter VALUES depend on partition/merge order (like
  * every MG implementation — and like Spark's own `collect_list`
  * ordering); the guarantees above hold for every order, so consumers
  * should derive order-invariant facts (membership checks, bound
  * verdicts) rather than exporting raw counters. Null tokens are
  * ignored, matching built-in counting aggregates.
  *
  * Returns `struct(n: long, entries: array<struct<token, est>>)`,
  * entries sorted est DESC, token ASC.
  */
case class MisraGriesTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MisraGriesTopK.Summary]
    with UnaryLike[Expression] {

  require(k >= 1, "sketch size k must be >= 1")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "token", child)

  override def nullable: Boolean = false
  override def dataType: DataType = MisraGriesTopK.schema
  override def prettyName: String = "misra_gries_topk"

  override def createAggregationBuffer(): MisraGriesTopK.Summary =
    new MisraGriesTopK.Summary(k)

  override def update(buffer: MisraGriesTopK.Summary, input: InternalRow): MisraGriesTopK.Summary = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: MisraGriesTopK.Summary,
      other: MisraGriesTopK.Summary): MisraGriesTopK.Summary = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: MisraGriesTopK.Summary): Any = buffer.toRow

  override def serialize(buffer: MisraGriesTopK.Summary): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): MisraGriesTopK.Summary =
    MisraGriesTopK.Summary.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): MisraGriesTopK =
    copy(child = newChild)
}

object MisraGriesTopK {

  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("entries", ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("est", LongType, nullable = false))), containsNull = false),
      nullable = false)))

  def apply(token: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      MisraGriesTopK(GraftColumnBridge.toExpression(token), k)
        .toAggregateExpression())

  final class Summary(val k: Int) {
    var n: Long = 0L
    val counts: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

    def add(token: UTF8String): Unit = {
      n += 1
      counts.get(token) match {
        case Some(c) => counts.update(token, c + 1)
        case None if counts.size < k =>
          // copy: the UTF8String may alias a reused input buffer
          counts.update(token.clone(), 1L)
        case None =>
          // decrement-all: amortized O(1) — each such event consumes
          // k+1 prior increments
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          counts.mapValuesInPlace((_, c) => c - 1)
          counts.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(counts.remove)
      }
    }

    /** Mergeable-summaries combine: add counters, then if over k trim
      * by the (k+1)-th largest value. */
    def mergeIn(other: Summary): Unit = {
      n += other.n
      other.counts.foreach { case (t, c) =>
        counts.update(t, counts.getOrElse(t, 0L) + c)
      }
      if (counts.size > k) {
        val vals = counts.values.toArray
        java.util.Arrays.sort(vals)
        val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
        val dead = mutable.ArrayBuffer.empty[UTF8String]
        counts.mapValuesInPlace((_, c) => c - cut)
        counts.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(counts.remove)
      }
    }

    def toRow: InternalRow = {
      val sorted = counts.toArray.sortWith { case ((ta, ca), (tb, cb)) =>
        ca > cb || (ca == cb && ta.compareTo(tb) < 0)
      }
      val entries = sorted.map { case (t, c) =>
        InternalRow(t, c): Any
      }
      InternalRow(n, new GenericArrayData(entries))
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(n)
      out.writeInt(counts.size)
      counts.foreach { case (t, c) =>
        val b = t.getBytes
        out.writeInt(b.length)
        out.write(b)
        out.writeLong(c)
      }
      out.flush()
      bos.toByteArray
    }
  }

  object Summary {
    def fromBytes(bytes: Array[Byte], k: Int): Summary = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val s = new Summary(k)
      s.n = in.readLong()
      val size = in.readInt()
      var i = 0
      while (i < size) {
        val len = in.readInt()
        val b = new Array[Byte](len)
        in.readFully(b)
        s.counts.update(UTF8String.fromBytes(b), in.readLong())
        i += 1
      }
      s
    }
  }
}
