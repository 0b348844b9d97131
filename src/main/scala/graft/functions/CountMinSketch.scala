package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch as a typed imperative aggregate: a fixed
  * `depth × width` counter matrix summarizing a token stream's
  * frequencies in O(depth·width) state regardless of input size. The
  * point estimate for a token is the MINIMUM of its `depth` bucket
  * counters — never an undercount (every counter the token hashes to
  * received all of its increments), over by at most the collision mass
  * in its emptiest bucket (Cormode & Muthukrishnan 2005).
  *
  * Scale shape: the constant-state alternative to a vocabulary-sized
  * `groupBy(token).count()` term table — each map task keeps
  * depth·width longs, the partial-aggregate shuffle carries one matrix
  * per task, and merging is element-wise addition. Unlike
  * [[MisraGriesTopK]] (whose counter values depend on merge order,
  * with order-invariant GUARANTEES), the CMS matrix is a SUM — fully
  * order-invariant, so estimates are bit-identical across partitionings
  * and replayable by the SQL oracle.
  *
  * Bucket mapping is the repo's portable-hash convention
  * ([[Portable.hash32]]): bucket_d(t) = first-8-hex-digits of
  * md5("cms<d>:" + t) mod width — engine-portable (the oracle replays
  * it verbatim in SQL) at the cost of md5 over cheaper pairwise-
  * independent families; a throughput-first production variant would
  * swap in xxhash here AND in every estimate site together.
  *
  * Null tokens are ignored (the counting-aggregate convention).
  * Returns `struct(n: long, counters: array<array<long>>)` with
  * `counters(d)(b)` the depth-d bucket-b counter.
  */
case class CountMinSketch(child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CountMinSketch.Matrix]
    with UnaryLike[Expression] {

  require(depth >= 1 && depth <= 16, "depth must be in [1, 16]")
  require(width >= 2, "width must be >= 2")

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    KernelTypeChecks.expectString(prettyName, "token", child)

  override def nullable: Boolean = false
  override def dataType: DataType = CountMinSketch.schema
  override def prettyName: String = "count_min_sketch"

  override def createAggregationBuffer(): CountMinSketch.Matrix =
    new CountMinSketch.Matrix(depth, width)

  override def update(buffer: CountMinSketch.Matrix, input: InternalRow): CountMinSketch.Matrix = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[UTF8String])
    buffer
  }

  override def merge(buffer: CountMinSketch.Matrix,
      other: CountMinSketch.Matrix): CountMinSketch.Matrix = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: CountMinSketch.Matrix): Any = buffer.toRow

  override def serialize(buffer: CountMinSketch.Matrix): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): CountMinSketch.Matrix =
    CountMinSketch.Matrix.fromBytes(bytes, depth, width)

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): CountMinSketch =
    copy(child = newChild)
}

object CountMinSketch {

  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("counters", ArrayType(ArrayType(LongType, containsNull = false),
      containsNull = false), nullable = false)))

  def apply(token: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.toColumn(
      CountMinSketch(GraftColumnBridge.toExpression(token), depth, width)
        .toAggregateExpression())

  /** Column-side bucket of a token at depth `d` — the same md5 mapping
    * the aggregate applies row-side, so estimate lookups against a
    * sketch column agree with the matrix bit-for-bit. */
  def bucketCol(token: Column, d: Int, width: Int): Column =
    pmod(Portable.hash32(concat(lit(s"cms$d:"), token)), lit(width))

  /** Point estimate of `token`'s frequency from a sketch struct column:
    * min over depths of the token's bucket counter. */
  def estimate(sketch: Column, token: Column, depth: Int, width: Int): Column =
    least((0 until depth).map(d =>
      element_at(element_at(sketch.getField("counters"), d + 1),
        (bucketCol(token, d, width) + lit(1)).cast("int"))): _*)

  final class Matrix(val depth: Int, val width: Int) {
    var n: Long = 0L
    val cells: Array[Long] = new Array[Long](depth * width)

    // one MessageDigest per buffer, reset per hash — allocation-free on
    // the hot path (getInstance per token measured ~3x slower)
    private val md = MessageDigest.getInstance("MD5")
    private val prefixes: Array[Array[Byte]] =
      Array.tabulate(depth)(d => s"cms$d:".getBytes("UTF-8"))

    /** First 8 hex digits of md5(prefix ++ tokenBytes) as an unsigned
      * 32-bit value — the JVM twin of SQL
      * `CAST(concat('0x', substr(md5(...), 1, 8)) AS BIGINT)`. */
    private def bucket(d: Int, tokenBytes: Array[Byte]): Int = {
      md.reset()
      md.update(prefixes(d))
      md.update(tokenBytes)
      val dig = md.digest()
      val v = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
        ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
      (v % width).toInt
    }

    def add(token: UTF8String): Unit = {
      n += 1
      val bytes = token.getBytes
      var d = 0
      while (d < depth) {
        cells(d * width + bucket(d, bytes)) += 1L
        d += 1
      }
    }

    def mergeIn(other: Matrix): Unit = {
      n += other.n
      var i = 0
      while (i < cells.length) {
        cells(i) += other.cells(i)
        i += 1
      }
    }

    def toRow: InternalRow = {
      val rows: Array[Any] = Array.tabulate(depth) { d =>
        new GenericArrayData(java.util.Arrays.copyOfRange(cells, d * width, (d + 1) * width))
      }
      InternalRow(n, new GenericArrayData(rows))
    }

    def toBytes: Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      out.writeLong(n)
      var i = 0
      while (i < cells.length) { out.writeLong(cells(i)); i += 1 }
      out.flush()
      bos.toByteArray
    }
  }

  object Matrix {
    def fromBytes(bytes: Array[Byte], depth: Int, width: Int): Matrix = {
      val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val m = new Matrix(depth, width)
      m.n = in.readLong()
      var i = 0
      while (i < m.cells.length) { m.cells(i) = in.readLong(); i += 1 }
      m
    }
  }
}
