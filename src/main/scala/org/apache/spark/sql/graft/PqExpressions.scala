package org.apache.spark.sql.graft

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization model for the PQ ANN path (graft.api.Ann.pqTopK):
  * `m` subspace codebooks of `ksub` centroids each, broadcast once per
  * executor like [[CentroidModel]]. Encoding reads vector cells straight out
  * of Catalyst `ArrayData` into tight double loops — the corpus-wide encode
  * pass is the hot path of the index build, same argument as the IVF
  * assignment expressions.
  */
final class PqModel(bc: Broadcast[Array[Array[Array[Double]]]]) extends Serializable {

  @transient private lazy val books: Array[Array[Array[Double]]] = bc.value

  def m: Int = bc.value.length

  /** Per-subspace nearest-centroid codes (strict <: first wins ties) —
    * the m-byte compressed representation of a vector. */
  def encode(v: ArrayData): ArrayData = {
    val x = v.toDoubleArray()
    val bs = books
    val dsub = x.length / bs.length
    val codes = new Array[Int](bs.length)
    var s = 0
    while (s < bs.length) {
      val cents = bs(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var dist = 0.0
        var j = 0
        while (j < dsub) { val t = x(off + j) - cent(j); dist += t * t; j += 1 }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }
}

/** `codes = pq_encode(vec)` — PQ corpus encoding. */
case class PqCodes(child: Expression, model: PqModel)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "pq_encode"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    model.encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Asymmetric-distance (ADC) lookup tables for a fixed query batch:
  * `tables(query_id)(sub)(code)` = squared L2 between the query's
  * subvector and that codebook centroid. Built once on the driver from the
  * (small) query side, broadcast, and summed per corpus row with `m` array
  * lookups — the classic PQ serving shape: the corpus is scanned as m-int
  * codes, never as full vectors. */
final class AdcTables(bc: Broadcast[Map[Long, Array[Array[Double]]]]) extends Serializable {

  @transient private lazy val tables: Map[Long, Array[Array[Double]]] = bc.value

  /** Approximate squared L2 of (query, encoded corpus vector): fixed
    * left-to-right fold over the m subspaces — part of the bit-exact
    * contract with the Python oracle. */
  def dist(queryId: Long, codes: ArrayData): Double = {
    val t = tables(queryId)
    var acc = 0.0
    var s = 0
    while (s < t.length) { acc += t(s)(codes.getInt(s)); s += 1 }
    acc
  }
}

/** `adist = pq_adc_dist(query_id, codes)`. */
case class PqAdcDist(left: Expression, right: Expression, tables: AdcTables)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "pq_adc_dist"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(LongType, ArrayType(IntegerType))
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(qid: Any, codes: Any): Any =
    tables.dist(qid.asInstanceOf[Long], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adcTables", tables, classOf[AdcTables].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => s"${ev.value} = $ref.dist($q, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
