package org.apache.spark.sql.graft

import _root_.graft.core.{HyperLogLog, Shingles, SimHash, Sketches}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** hll_distinct(value, p): mergeable HyperLogLog distinct-count aggregate
  * over string values ([[graft.core.HyperLogLog]] for the pinned,
  * cross-engine-deterministic spec). The aggregation buffer is the 2^p-byte
  * register array itself: partial aggregation folds values map-side, the
  * shuffle carries one sketch per (group, partition) instead of the value
  * set, and merge is an elementwise register max — the canonical mergeable-
  * sketch shape for distinct counting at 100 TB. Output is the standard
  * two-regime HLL estimate (raw harmonic mean; linear counting with the
  * engine-pinned ln below the raw range — [[graft.core.HyperLogLog]]):
  * DoubleType, bit-deterministic, ±1.04/sqrt(2^p) std error in the raw
  * regime and near-exact at small cardinalities.
  *
  * NULL values are ignored (standard SQL aggregate semantics); a group with
  * no non-null values estimates exactly 0.0 (all registers empty → linear
  * counting m·ln(m/m)) — callers wanting SQL COUNT(DISTINCT) NULL-emptiness
  * semantics filter first. `p` must be a query constant in [4, 16], checked
  * at analysis time like every lsh_* parameter.
  */
abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes {
  def child: Expression
  def pExpr: Expression

  override def children: Seq[Expression] = Seq(child, pExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    val const = LshParams.checkConstant(Seq(pExpr -> "p"))
    if (!const.isInstanceOf[TypeCheckSuccess.type]) return const
    SketchExprs.checkRange("p", LshParams.evalLong(pExpr, "p"),
      HyperLogLog.MinP, HyperLogLog.MaxP)
  }

  @transient protected lazy val p: Int = LshParams.evalLong(pExpr, "p").toInt

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HyperLogLog.add(buffer, SketchExprs.valueHash(v), p)
    buffer
  }

  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] = {
    HyperLogLog.mergeInto(buffer, input)
    buffer
  }

  // the register array IS the shuffle format — nothing to encode
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat
}

case class HllDistinct(
    child: Expression,
    pExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def prettyName: String = "hll_distinct"
  override def dataType: DataType = DoubleType
  override def eval(buffer: Array[Byte]): Any = HyperLogLog.estimate(buffer)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

private[graft] object SketchExprs {
  /** FxHash64 token hash of a UTF8String without the String/code-point
    * array round trip — this runs once per row on the aggregate update and
    * probe paths. */
  def valueHash(v: Any): Long = {
    val b = v.asInstanceOf[UTF8String].getBytes
    SimHash.tokenHashUtf8(b, 0, b.length)
  }

  /** 64-bit mix for LongType sketch inputs (SplitMix64 finalizer, Steele
    * et al. 2014 — public-domain constants): the zero-allocation path for
    * numeric keys, vs the UTF8 digit-string detour a cast would take.
    * NOTE: long 42 and string "42" hash differently by design — build and
    * probe must agree on the input type. */
  def valueHashLong(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def checkRange(name: String, v: Long, lo: Int, hi: Int): TypeCheckResult =
    if (v < lo || v > hi) TypeCheckFailure(s"$name must be in [$lo, $hi], got $v")
    else TypeCheckSuccess
}

/** bloom_build(value, log2m, k): mergeable Bloom-filter aggregate over
  * string or long values ([[graft.core.Sketches]] for the pinned hash
  * schedule and wire format; long inputs take the zero-allocation
  * SplitMix64 path — long 42 and string "42" are DIFFERENT keys, build
  * and probe must agree on the type). Returns the filter as BinaryType —
  * broadcast it back and
  * probe with [[BloomContains]] to prune a big scan before a shuffle
  * (runtime semi-join filtering, the classic 100 TB join-pruning move:
  * might_contain=false is a guaranteed non-member, so only possible matches
  * reach the join). Merge is a bitwise OR — order/partitioning invariant.
  */
case class BloomBuild(
    child: Expression,
    logmExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def prettyName: String = "bloom_build"
  override def children: Seq[Expression] = Seq(child, logmExpr, kExpr)
  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(StringType, LongType), LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    val const = LshParams.checkConstant(Seq(logmExpr -> "log2m", kExpr -> "k"))
    if (!const.isInstanceOf[TypeCheckSuccess.type]) return const
    val r = SketchExprs.checkRange("log2m", LshParams.evalLong(logmExpr, "log2m"), 6, 30)
    if (!r.isInstanceOf[TypeCheckSuccess.type]) return r
    SketchExprs.checkRange("k", LshParams.evalLong(kExpr, "k"), 1, 16)
  }

  @transient private lazy val logm = LshParams.evalLong(logmExpr, "log2m").toInt
  @transient private lazy val k = LshParams.evalLong(kExpr, "k").toInt

  override def createAggregationBuffer(): Array[Long] = Sketches.bloomEmpty(logm, k)

  @transient private lazy val longInput = child.dataType == LongType

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = if (longInput) SketchExprs.valueHashLong(v.asInstanceOf[Long])
              else SketchExprs.valueHash(v)
      Sketches.bloomAdd(buffer, h, k, logm)
    }
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    Sketches.mergeOr(buffer, input)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Sketches.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Sketches.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    Sketches.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), logmExpr = newChildren(1), kExpr = newChildren(2))
}

/** bloom_contains(bloom, value): probe a [[BloomBuild]] filter. False is
  * definitive (no false negatives); true may be a false positive at the
  * filter's design rate. Self-describing binary — log2m and k ride in the
  * header word. Hand codegen: the probe runs inside the scan's
  * whole-stage-codegen loop (a CodegenFallback here would break codegen for
  * the entire probe-side projection — the hot path this filter exists for). */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "bloom_contains"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(BinaryType, TypeCollection(StringType, LongType))
  override def dataType: DataType = BooleanType

  def probe(bloom: Array[Byte], v: UTF8String): Boolean =
    Sketches.bloomContainsBytes(bloom, SketchExprs.valueHash(v))
  def probeLong(bloom: Array[Byte], v: Long): Boolean =
    Sketches.bloomContainsBytes(bloom, SketchExprs.valueHashLong(v))

  @transient private lazy val longInput = right.dataType == LongType

  override protected def nullSafeEval(bloom: Any, v: Any): Any =
    if (longInput) probeLong(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])
    else probe(bloom.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomContains].getName)
    val m = if (longInput) "probeLong" else "probe"
    nullSafeCodeGen(ctx, ev, (b, v) => s"${ev.value} = $ref.$m($b, $v);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cms_build(value, d, log2w): mergeable Count-Min sketch aggregate —
  * approximate per-value frequencies from one pass without shuffling the
  * value set (estimate ≥ true count; error ≤ N·e/2^log2w with probability
  * 1−e^−d). Merge is an elementwise counter add — order/partitioning
  * invariant, and exact in 64-bit integers, so the sketch is bit-pinnable
  * like the Bloom/HLL states. */
case class CmsBuild(
    child: Expression,
    dExpr: Expression,
    logwExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def prettyName: String = "cms_build"
  override def children: Seq[Expression] = Seq(child, dExpr, logwExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    val const = LshParams.checkConstant(Seq(dExpr -> "d", logwExpr -> "log2w"))
    if (!const.isInstanceOf[TypeCheckSuccess.type]) return const
    val r = SketchExprs.checkRange("d", LshParams.evalLong(dExpr, "d"), 1, 8)
    if (!r.isInstanceOf[TypeCheckSuccess.type]) return r
    // cap: d=8 × 2^20 is already a 64 MB grid per group — CMS error decays
    // as 1/w, so wider grids buy nothing a bigger d can't
    SketchExprs.checkRange("log2w", LshParams.evalLong(logwExpr, "log2w"), 4, 20)
  }

  @transient private lazy val d = LshParams.evalLong(dExpr, "d").toInt
  @transient private lazy val logw = LshParams.evalLong(logwExpr, "log2w").toInt

  override def createAggregationBuffer(): Array[Long] = Sketches.cmsEmpty(d, logw)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Sketches.cmsAdd(buffer, SketchExprs.valueHash(v), d, logw)
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    Sketches.mergeAdd(buffer, input)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Sketches.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Sketches.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    Sketches.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), dExpr = newChildren(1), logwExpr = newChildren(2))
}

/** hll_sketch(value, p): like [[HllDistinct]] but emits the sketch STATE
  * (BinaryType, [[graft.core.Sketches.hllToBytes]] wire format) instead of
  * the estimate — the persistence half of the sketch algebra. Write the
  * per-(group, day) sketches to a table once; later rollups re-aggregate
  * them with [[SketchMerge]] and read the estimate with [[HllEstimate]],
  * never touching the raw data again. Merge associativity makes the rolled
  * estimate bit-equal to one computed flat over the union. */
case class HllSketch(
    child: Expression,
    pExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0) extends HllAggBase {
  override def prettyName: String = "hll_sketch"
  override def dataType: DataType = BinaryType
  override def eval(buffer: Array[Byte]): Any = Sketches.hllToBytes(buffer, p)
  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), pExpr = newChildren(1))
}

/** sketch_merge(bin): re-aggregate persisted sketch states ([[HllSketch]],
  * [[BloomBuild]] or [[CmsBuild]] output — the kind and merge op are
  * dispatched from the wire header). NULL inputs are skipped; a group with
  * no non-null sketches yields NULL. All sketches in a group must share one
  * shape. */
case class SketchMerge(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  override def prettyName: String = "sketch_merge"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  // empty array = "no sketch seen yet" (a zero-length sketch is invalid)
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def mergeInto(buffer: Array[Byte], bytes: Array[Byte]): Array[Byte] =
    if (bytes.isEmpty) buffer
    else if (buffer.isEmpty) bytes.clone()
    else { Sketches.mergeBytes(buffer, bytes); buffer }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else mergeInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], input: Array[Byte]): Array[Byte] =
    mergeInto(buffer, input)

  override def eval(buffer: Array[Byte]): Any = if (buffer.isEmpty) null else buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(storageFormat: Array[Byte]): Array[Byte] = storageFormat

  override def withNewMutableAggBufferOffset(newOffset: Int): SketchMerge =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SketchMerge =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** hist_sketch(value, b): mergeable HDR-style quantile histogram over
  * non-negative longs ([[graft.core.Sketches]].histBucketOf for the exact
  * bucketing spec). One pass, (64−b)·2^b counters of fixed state per group
  * (16 KB at b=5) against exact percentile's full sort — the standard
  * latency/length-distribution shape at 100 TB. Counts merge by add, so the
  * state is order/partitioning-invariant, persists, and rolls up through
  * [[SketchMerge]]; [[HistQuantile]] reads nearest-rank quantiles with
  * relative error ≤ 2^−b. */
case class HistSketch(
    child: Expression,
    bExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  override def prettyName: String = "hist_sketch"
  override def children: Seq[Expression] = Seq(child, bExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    val const = LshParams.checkConstant(Seq(bExpr -> "b"))
    if (!const.isInstanceOf[TypeCheckSuccess.type]) return const
    SketchExprs.checkRange("b", LshParams.evalLong(bExpr, "b"), 1, 8)
  }

  @transient private lazy val b = LshParams.evalLong(bExpr, "b").toInt

  override def createAggregationBuffer(): Array[Long] = Sketches.histEmpty(b)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Sketches.histAdd(buffer, v.asInstanceOf[Long], b)
    buffer
  }

  override def merge(buffer: Array[Long], input: Array[Long]): Array[Long] = {
    Sketches.mergeAdd(buffer, input)
    buffer
  }

  override def eval(buffer: Array[Long]): Any = Sketches.toBytes(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Sketches.toBytes(buffer)
  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    Sketches.fromBytes(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): HistSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HistSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), bExpr = newChildren(1))
}

/** hist_quantile(bin, q): nearest-rank quantile from a persisted
  * [[HistSketch]] state (-1 for an empty histogram). Hand codegen like the
  * other probes. */
case class HistQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "hist_quantile"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(bin: Any, q: Any): Any =
    Sketches.histQuantileBytes(bin.asInstanceOf[Array[Byte]], q.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (bin, q) => s"graft.core.Sketches.histQuantileBytes($bin, $q)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ln_pinned(x): the engine-pinned natural log on [1, ∞)
  * ([[graft.core.HyperLogLog.lnPinned]]) as a SQL/column primitive —
  * bit-identical wherever the documented recipe is followed, unlike libm
  * ln. What makes deterministic weighted sampling (exponential keys)
  * expressible as a pure column expression. */
case class LnPinned(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "ln_pinned"
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    HyperLogLog.lnPinned(v.asInstanceOf[Double])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, x => s"graft.core.HyperLogLog.lnPinned($x)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** hll_estimate(bin): distinct-count estimate from a persisted [[HllSketch]]
  * state. */
case class HllEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ImplicitCastInputTypes {
  override def prettyName: String = "hll_estimate"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(v: Any): Any =
    Sketches.hllEstimateBytes(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      b => s"graft.core.Sketches.hllEstimateBytes($b)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** cms_estimate(cms, value): estimated frequency of `value` in the stream a
  * [[CmsBuild]] sketch summarized (min over the d counter rows). Hand
  * codegen like [[BloomContains]] — probes stay inside whole-stage codegen. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "cms_estimate"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType

  def probe(cms: Array[Byte], v: UTF8String): Long =
    Sketches.cmsEstimateBytes(cms, SketchExprs.valueHash(v))

  override protected def nullSafeEval(cms: Any, v: Any): Any =
    probe(cms.asInstanceOf[Array[Byte]], v.asInstanceOf[UTF8String])
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cmsExpr", this, classOf[CmsEstimate].getName)
    nullSafeCodeGen(ctx, ev, (c, v) => s"${ev.value} = $ref.probe($c, $v);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
