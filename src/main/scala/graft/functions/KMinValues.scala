package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** K-minimum-values distinct-count sketch over a 60-bit hash column:
  * keep the `k` smallest DISTINCT hash values seen; if fewer than `k`
  * distinct hashes exist the count is exact, otherwise estimate
  * `(k−1) · 2^60 / kthSmallest` (Bar-Yossef et al. 2002).
  *
  * Why it exists next to `approx_count_distinct` (HLL++): KMV is
  * DETERMINISTIC given the hash column — same input set, same
  * estimate, on every engine, partitioning, and merge order (the k
  * smallest of a set are merge-order invariant) — so the estimate
  * itself is oracle-checkable value-for-value in SQL, not merely
  * bounded. It is also exactly mergeable (union, trim to k) and
  * composes into union/intersection estimates across sketches.
  *
  * Scale shape: bounded state (`k` longs) per task regardless of
  * input size, ≤ `k` values shuffled per partial — the same
  * no-term-table contract as [[MisraGriesTopK]]. Relative error is
  * ~1/√(k−2). Feed it [[Portable.hash60]] of the key; null hashes are
  * ignored like the built-in counting aggregates.
  */
case class KMinValues(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinValues.Sketch]
    with UnaryLike[Expression] {

  require(k >= 2, "sketch size k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: argument 'hash' must be bigint (use Portable.hash60), " +
          s"got ${other.simpleString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KMinValues.Sketch = new KMinValues.Sketch(k)

  override def update(buffer: KMinValues.Sketch, input: InternalRow): KMinValues.Sketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KMinValues.Sketch, other: KMinValues.Sketch): KMinValues.Sketch = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KMinValues.Sketch): Any = buffer.estimate

  override def serialize(buffer: KMinValues.Sketch): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): KMinValues.Sketch =
    KMinValues.Sketch.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinValues =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KMinValues =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KMinValues =
    copy(child = newChild)
}

/** The same KMV aggregation, but eval returns the SKETCH ITSELF — the
  * sorted array of k smallest distinct hashes — instead of collapsing
  * to the estimate. The array is what sketch ALGEBRA composes on:
  * union = k smallest of the concatenated arrays, intersection via
  * the Beyer et al. (SIGMOD'07) membership ratio — all expressible as
  * plain codegen'd array functions downstream, so set-operation
  * estimates between segments never rescan the data. State and
  * shuffle bounds are identical to [[KMinValues]] (≤ k longs). */
case class KMinSet(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KMinValues.Sketch]
    with UnaryLike[Expression] {

  require(k >= 2, "sketch size k must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName: argument 'hash' must be bigint (use Portable.hash60), " +
          s"got ${other.simpleString}")
    }

  override def nullable: Boolean = false
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_set"

  override def createAggregationBuffer(): KMinValues.Sketch = new KMinValues.Sketch(k)

  override def update(buffer: KMinValues.Sketch, input: InternalRow): KMinValues.Sketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KMinValues.Sketch, other: KMinValues.Sketch): KMinValues.Sketch = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: KMinValues.Sketch): Any = {
    val out = new Array[Long](buffer.mins.size)
    val it = buffer.mins.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def serialize(buffer: KMinValues.Sketch): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): KMinValues.Sketch =
    KMinValues.Sketch.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KMinSet =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KMinSet =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): KMinSet =
    copy(child = newChild)
}

object KMinSet {
  def apply(hash: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      KMinSet(GraftColumnBridge.toExpression(hash), k)
        .toAggregateExpression())
}

object KMinValues {

  /** 2^60 — the size of [[Portable.hash60]]'s value space. */
  val HashSpace: Double = 1152921504606846976.0

  def apply(hash: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      KMinValues(GraftColumnBridge.toExpression(hash), k)
        .toAggregateExpression())

  final class Sketch(val k: Int) {
    // k smallest distinct hashes; TreeSet keeps max (= kth smallest)
    // accessible in O(log k)
    val mins: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()

    def add(v: Long): Unit = {
      if (mins.size < k) { mins.add(v); () }
      else if (v < mins.last() && !mins.contains(v)) {
        mins.pollLast()
        mins.add(v)
        ()
      }
    }

    def mergeIn(other: Sketch): Unit = {
      val it = other.mins.iterator()
      while (it.hasNext) add(it.next())
    }

    def estimate: Double =
      if (mins.size < k) mins.size.toDouble
      else (k - 1).toDouble * HashSpace / mins.last().toDouble

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeInt(mins.size)
      val it = mins.iterator()
      while (it.hasNext) out.writeLong(it.next())
      out.flush()
      bos.toByteArray
    }
  }

  object Sketch {
    def fromBytes(bytes: Array[Byte], k: Int): Sketch = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val s = new Sketch(k)
      val size = in.readInt()
      var i = 0
      while (i < size) { s.mins.add(in.readLong()); i += 1 }
      s
    }
  }
}
