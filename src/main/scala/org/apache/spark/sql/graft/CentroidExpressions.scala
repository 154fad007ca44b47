package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Broadcast-backed coarse-quantizer model for the IVF ANN path
  * (graft.api.Ann.ivfTopK). The centroid table rides a Spark broadcast —
  * one copy per executor however many tasks reference the plan — and the
  * expressions below read vector cells straight out of Catalyst `ArrayData`
  * (one primitive copy per row, then tight double loops). The Scala-UDF
  * predecessor deserialized every row into a boxed `Seq[Double]` before any
  * arithmetic — a per-row allocation tax on the corpus-wide assignment pass,
  * which is the hot path of the whole index build at scale.
  */
final class CentroidModel(bc: Broadcast[Array[Array[Double]]]) extends Serializable {

  @transient private lazy val cs: Array[Array[Double]] = bc.value

  /** Index of the L2-nearest centroid (strict <: first wins ties). */
  def nearest(v: ArrayData): Int = {
    val x = v.toDoubleArray()
    val cents = cs
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dist = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cent(j); dist += t * t; j += 1 }
      if (dist < bestD) { bestD = dist; best = c }
      c += 1
    }
    best
  }

  /** Squared L2 to the nearest centroid (same strict-< winner as
    * [[nearest]]; full accumulation in index order — part of the bit-exact
    * contract with the Python oracle). */
  def nearestDist(v: ArrayData): Double = {
    val x = v.toDoubleArray()
    val cents = cs
    var bestD = Double.MaxValue
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dist = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cent(j); dist += t * t; j += 1 }
      if (dist < bestD) bestD = dist
      c += 1
    }
    bestD
  }

  /** The `n` nearest centroid indices, ordered by (distance, index). */
  def probes(v: ArrayData, n: Int): ArrayData = {
    val x = v.toDoubleArray()
    val cents = cs
    val dists = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      var dist = 0.0
      var j = 0
      while (j < x.length) { val t = x(j) - cent(j); dist += t * t; j += 1 }
      dists(c) = dist
      c += 1
    }
    val idx = Array.range(0, cents.length)
      .sortBy(i => (dists(i), i))
    new GenericArrayData(java.util.Arrays.copyOf(idx, math.min(n, idx.length)))
  }
}

/** `cell = nearest_centroid(vec)` — IVF corpus assignment. */
case class NearestCell(child: Expression, model: CentroidModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "nearest_centroid"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(v: Any): Any =
    model.nearest(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidModel", model, classOf[CentroidModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearest($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dist = nearest_centroid_dist(vec)` — squared L2 to the assigned cell's
  * centroid: the centrality score of prototype/coreset selection. */
case class NearestCellDist(child: Expression, model: CentroidModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "nearest_centroid_dist"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(v: Any): Any =
    model.nearestDist(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidModel", model, classOf[CentroidModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.nearestDist($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `cells = probe_centroids(vec)` — the nprobe query-side cell list. */
case class ProbeCells(child: Expression, model: CentroidModel, nprobe: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "probe_centroids"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    model.probes(v.asInstanceOf[ArrayData], nprobe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidModel", model, classOf[CentroidModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probes($c, $nprobe);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
