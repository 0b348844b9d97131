package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, StructField, StructType}

/** Nearest-trained-centroid assignment as a SINGLE PROJECTION: for an
  * `array<float>` vector column, returns `struct(cell, cscore)` — the
  * argmax-cosine cell over a driver-collected centroid matrix.
  *
  * This is the IVF index-build hot path done the way it must be at
  * 100 TB: the centroid set is catalog-sized (cells × dim), so it ships
  * inside the expression; each corpus row costs `cells · dim`
  * multiply-adds with NO |cells|-way row expansion, NO shuffle, and no
  * aggregate — the plan is scan → project. (The crossJoin + min-struct
  * aggregate formulation this replaces sorted n·cells rows per
  * partition.)
  *
  * Arithmetic is bit-compatible with the composable formulation and the
  * SQL oracle: per-cell dot products accumulate left-to-right in double
  * (null elements as 0, like [[FloatVectorDot]]); centroid self-norms
  * are precomputed once (the same value every row); the score is
  * `round(dot/denom, 4)` with Spark's double-round semantics
  * (BigDecimal.valueOf, HALF_UP) and −0.0 normalized; zero-norm
  * cells/vectors score null. Cells are pre-sorted ascending and ties
  * update on strict improvement only, so ties break to the smallest
  * cell and null scores rank last — exactly the
  * `row_number() OVER (ORDER BY cscore DESC NULLS LAST, cell)` = 1 row.
  * A vector with no non-null score (zero norm) maps to the smallest
  * cell with a null score. Embeddings are assumed NaN-free (dense
  * corpus vectors).
  *
  * `cells` hold Catalyst-internal values of `cellType`, sorted
  * ascending; `mat(i)` is the float-quantized centroid of `cells(i)`.
  */
case class NearestCentroid(child: Expression, cellType: DataType,
    cells: Array[Any], mat: Array[Array[Float]], norms: Array[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("cell", cellType, nullable = true),
    StructField("cscore", DoubleType, nullable = true)))

  override def prettyName: String = "nearest_centroid"

  private def roundSpark(x: Double): Double =
    // Spark's Round on double: canonical-decimal BigDecimal, HALF_UP.
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    var qq = 0.0
    var j = 0
    while (j < n) {
      if (!x.isNullAt(j)) { val q = x.getFloat(j).toDouble; qq += q * q }
      j += 1
    }
    val qNorm = math.sqrt(qq)
    var bestIdx = -1
    var bestScore = 0.0
    var i = 0
    while (i < mat.length) {
      val c = mat(i)
      val denom = qNorm * norms(i)
      if (denom != 0.0) {
        var dot = 0.0
        val m = math.min(n, c.length)
        j = 0
        while (j < m) {
          if (!x.isNullAt(j)) dot += x.getFloat(j).toDouble * c(j)
          j += 1
        }
        val raw = dot / denom
        if (!raw.isNaN) { // NaN inputs: treat like a null score (skip)
          val s = roundSpark(raw) + 0.0
          if (bestIdx < 0 || s > bestScore) { bestIdx = i; bestScore = s }
        }
      }
      i += 1
    }
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    if (bestIdx >= 0) {
      row.update(0, cells(bestIdx))
      row.update(1, bestScore)
    } else {
      // no scorable cell (zero-norm vector): smallest cell, null score
      row.update(0, if (cells.nonEmpty) cells(0) else null)
      row.update(1, null)
    }
    row
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** Build from the EXTERNAL (collected) centroid rows: (cell, centroid
    * as Seq[Float]). Sorts by cell ascending (tie-break order), converts
    * cells to Catalyst-internal values, precomputes self-norms. */
  def apply(vec: Column, cellType: DataType,
      centroidRows: Seq[(Any, Seq[Float])]): Column = {
    require(centroidRows.nonEmpty, "centroid set must not be empty")
    val sorted = centroidRows.sortWith { (a, b) =>
      a._1.asInstanceOf[Comparable[Any]].compareTo(b._1) < 0
    }
    val conv = CatalystTypeConverters.createToCatalystConverter(cellType)
    val cells = sorted.map(r => conv(r._1)).toArray
    val mat = sorted.map(_._2.map(f => f: Float).toArray).toArray
    val norms = mat.map { c =>
      var s = 0.0
      var j = 0
      while (j < c.length) { s += c(j).toDouble * c(j).toDouble; j += 1 }
      math.sqrt(s)
    }
    GraftColumnBridge.toColumn(NearestCentroid(
      GraftColumnBridge.toExpression(vec), cellType, cells, mat, norms))
  }
}
