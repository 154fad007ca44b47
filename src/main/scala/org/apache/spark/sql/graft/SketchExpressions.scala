package org.apache.spark.sql.graft

import _root_.graft.core.{HyperLogLog, Shingles, SimHash}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** hll_distinct(value, p): mergeable HyperLogLog distinct-count aggregate
  * over string values ([[graft.core.HyperLogLog]] for the pinned,
  * cross-engine-deterministic spec). The aggregation buffer is the 2^p-byte
  * register array itself: partial aggregation folds values map-side, the
  * shuffle carries one sketch per (group, partition) instead of the value
  * set, and merge is an elementwise register max — the canonical mergeable-
  * sketch shape for distinct counting at 100 TB. Output is the raw HLL
  * estimate (DoubleType, bit-deterministic, ±1.04/sqrt(2^p) std error).
  *
  * NULL values are ignored (standard SQL aggregate semantics); a group with
  * no non-null values estimates 0 distinct via the all-zero register array's
  * alpha_m·m correction-free estimate — callers wanting SQL COUNT(DISTINCT)
  * NULL-emptiness semantics filter first. `p` must be a query constant in
  * [4, 16], checked at analysis time like every lsh_* parameter.
  */
case class HllDistinct(
    child: Expression,
    pExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  override def prettyName: String = "hll_distinct"
  override def children: Seq[Expression] = Seq(child, pExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    val const = LshParams.checkConstant(Seq(pExpr -> "p"))
    if (!const.isInstanceOf[TypeCheckSuccess.type]) return const
    val v = LshParams.evalLong(pExpr, "p")
    if (v < HyperLogLog.MinP || v > HyperLogLog.MaxP)
      TypeCheckFailure(s"p must be in [${HyperLogLog.MinP}, ${HyperLogLog.MaxP}], got $v")
    else TypeCheckSuccess
  }

  @transient private lazy val p = LshParams.evalLong(pExpr, "p").toInt

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val cps = Shingles.codePoints(v.asInstanceOf[UTF8String].toString)
      HyperLogLog.add(buffer, SimHash.tokenHash(cps, cps.length), p)
    }
    buffer
  }

  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] = {
    HyperLogLog.mergeInto(buffer, input)
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = HyperLogLog.rawEstimate(buffer)

  // the register array IS the wire format — nothing to encode
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pExpr = newChildren(1))
}
