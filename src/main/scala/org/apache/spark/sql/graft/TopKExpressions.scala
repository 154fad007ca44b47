package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k state for [[TopKByScore]]: a k-capacity binary min-heap
  * over (score, id) pairs in primitive arrays, rooted at the WEAKEST held
  * entry so an incoming row needs one root comparison to accept/reject.
  * Strength order is (score DESC, id ASC) — the id tiebreak makes the
  * result a deterministic function of the row SET, independent of
  * partitioning and arrival order, which is what lets the aggregate
  * replace a window without becoming layout-dependent.
  */
private[graft] final class TopKHeap(val k: Int) {
  private[graft] val scores = new Array[Double](k)
  private[graft] val ids = new Array[Long](k)
  private[graft] var size = 0

  /** (s1,i1) strictly weaker than (s2,i2) under (score DESC, id ASC). */
  @inline private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    if (c != 0) c < 0 else i1 > i2
  }

  def offer(s: Double, id: Long): Unit = {
    if (size < k) {
      // grow: insert at the end, sift up toward the weakest-at-root
      var i = size
      scores(i) = s; ids(i) = id; size += 1
      while (i > 0) {
        val p = (i - 1) >> 1
        if (weaker(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else i = 0
      }
    } else if (weaker(scores(0), ids(0), s, id)) {
      // full and the candidate beats the current weakest: replace the root
      scores(0) = s; ids(0) = id
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var w = i // weakest of the triple belongs at the parent slot
        if (l < size && weaker(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && weaker(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) done = true else { swap(i, w); i = w }
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeFrom(other: TopKHeap): Unit = {
    var i = 0
    while (i < other.size) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Held entries in strength order (score DESC, id ASC). */
  def sortedIndices: Array[Int] = {
    val idx = Array.range(0, size)
    // strongest first = reverse weakness
    idx.sortWith((a, b) => weaker(scores(b), ids(b), scores(a), ids(a)))
  }

  def serialize: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * size)
    bb.putInt(k).putInt(size)
    var i = 0
    while (i < size) { bb.putDouble(scores(i)).putLong(ids(i)); i += 1 }
    bb.array()
  }
}

private[graft] object TopKHeap {
  def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val h = new TopKHeap(bb.getInt())
    val n = bb.getInt()
    var i = 0
    // heap order is preserved by the flat dump, so restore positionally
    while (i < n) { h.scores(i) = bb.getDouble(); h.ids(i) = bb.getLong(); i += 1 }
    h.size = n
    h
  }
}

/** `topk_by(score, id, k)` — per-group top-k SELECTION as a mergeable
  * aggregate: returns `array<struct<score double, id bigint>>`, the k
  * strongest rows under (score DESC, id ASC), sorted in that order.
  *
  * This is the scale-shape alternative to the
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` idiom. The
  * window shuffles EVERY row to its group's partition and sorts the whole
  * group — a popular group (one language at 100 TB) is a hot partition
  * sorting billions of rows it will throw away. This aggregate folds
  * map-side: each task keeps a k-entry heap per group, the shuffle carries
  * at most k entries per (group, task) — 16·k bytes — and merge is
  * re-offering k entries. Skew cost collapses from sort-the-group to
  * heap-the-partition; no row payload crosses the wire (select ids here,
  * then broadcast-join the k·|groups| winners back for payloads).
  *
  * Deterministic by construction: the id tiebreak totally orders rows, so
  * the result is a pure function of the row set (partitioning/arrival
  * order can't change it — the property every `queries()` gate relies on).
  * NaN scores rank ABOVE every finite score (java.lang.Double.compare —
  * the same largest-value placement Spark's DESC sort and DuckDB give
  * NaN, so the window-idiom oracle agrees); filter them first if NaN
  * means "unscored" in your data.
  * NULL score or id skips the row (SQL aggregate convention); ids must be
  * unique per group for the tiebreak to be total (duplicate (score, id)
  * pairs make the survivor-set ambiguous only between identical entries,
  * which is output-invariant anyway).
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with ImplicitCastInputTypes {

  override def prettyName: String = "topk_by"
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType, LongType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    val const = LshParams.checkConstant(Seq(kExpr -> "k"))
    if (!const.isInstanceOf[TypeCheckSuccess.type]) return const
    SketchExprs.checkRange("k", LshParams.evalLong(kExpr, "k"), 1, 1 << 20)
  }

  @transient private lazy val k = LshParams.evalLong(kExpr, "k").toInt

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    val s = scoreExpr.eval(input)
    val id = idExpr.eval(input)
    if (s != null && id != null) {
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKHeap, input: TopKHeap): TopKHeap = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: TopKHeap): Any = {
    val order = buffer.sortedIndices
    val rows = new Array[Any](order.length)
    var i = 0
    while (i < order.length) {
      val j = order(i)
      rows(i) = new GenericInternalRow(Array[Any](buffer.scores(j), buffer.ids(j)))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = buffer.serialize
  override def deserialize(storageFormat: Array[Byte]): TopKHeap =
    TopKHeap.deserialize(storageFormat)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1), kExpr = newChildren(2))
}
