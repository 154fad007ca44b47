package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType, LongType}

/** `cosine_sketch64(vec)` → 64-bit random-hyperplane sketch under a seeded
  * [[graft.core.CosineFamily]]: bit i = 1 iff the vector's dot product with
  * the i-th N(0,1) hyperplane normal is >= 0. Completes the LSH family
  * triad (MinHash/Jaccard, p-stable/Euclidean, sign/cosine); equal
  * bit-chunks of the sketch block candidate pairs for cosine similarity
  * exactly like SimHash's pigeonhole banding blocks Hamming neighbors.
  * NULL vector → NULL; vector elements must be non-null (same contract as
  * `lsh_euclidean`). The family is derived once per (nbits, seed, dim) per
  * JVM — mixed dimensions simply resolve to different cached families. */
case class CosineSketch64(child: Expression, nbits: Int, seed: Long)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(nbits >= 1 && nbits <= 64, s"nbits must be in [1, 64], got $nbits")

  override def prettyName: String = "cosine_sketch64"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toDoubleArray()
    graft.core.CosineFamily(nbits, seed, arr.length).sketch(arr)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object CosineSim {

  /** dot/(√Σa²·√Σb²) with strict left-to-right accumulation: per element,
    * multiply then add, in array order, no FMA — the identical IEEE op
    * sequence as the `zip_with`+`aggregate` formulation this expression
    * replaced, so every pinned cosine oracle is unchanged bit for bit.
    * Null (boxed) for length mismatch or a null element — the same result
    * the HOF chain produced (zip_with pads with null, the products fold to
    * null). Zero norms divide to IEEE NaN/Inf exactly like the Column `/`
    * (double division is never an ANSI error). */
  def computeBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var dot = 0.0
    i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < n) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { val y = b.getDouble(i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

object MatchCount {

  /** Count of positions where the two long arrays agree — the MinHash
    * signature-similarity numerator. Null (boxed) for length mismatch or a
    * null element. NOTE: this is deliberately STRICTER than the
    * zip_with/aggregate fold it replaced — that fold padded the shorter
    * array with nulls and scored each padded position as a mismatch
    * (numeric result), whereas this returns NULL so a malformed pair is
    * dropped by the est_sim filter instead of under-scored. Signatures are
    * fixed-length k, so well-formed data never hits the difference. */
  def computeBoxed(a: ArrayData, b: ArrayData): java.lang.Integer = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      i += 1
    }
    var c = 0
    i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }
}

/** `match_count(a, b)` — component-agreement count of two long-array
  * signatures, codegen'd: the estimate kernel of the signature near-dup
  * path, previously an interpreted `aggregate(zip_with(...))` per candidate
  * pair (the same lambda tax [[CosineSim]] removed from the cosine paths). */
case class MatchCount(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "match_count"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MatchCount.computeBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MatchCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Integer ${ev.value}_r = $cls.computeBoxed($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.intValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object NormSq {

  /** Σv² with the identical left-to-right accumulation as
    * `aggregate(v, 0.0, (acc, x) => acc + x*x)` — bit-equal to the HOF
    * guard it replaces; null (boxed) on a null element, as the HOF fold
    * null-propagates. */
  def computeBoxed(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      i += 1
    }
    var acc = 0.0
    i = 0
    while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    acc
  }
}

/** `norm_sq(v)` — squared L2 norm as a codegen'd expression. Exists for the
  * zero-norm guards on the embedding hot paths (cosineLshPairs,
  * SemanticDedup, embedOverlap): the interpreted HOF fold they previously
  * used re-introduced exactly the per-row lambda overhead [[CosineSim]]
  * removed from the pair stage. */
case class NormSq(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "norm_sq"
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    NormSq.computeBoxed(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = NormSq.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, v => s"""
      java.lang.Double ${ev.value}_r = $cls.computeBoxed($v);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `cosine_sim(a, b)` — pairwise cosine similarity as a single codegen'd
  * expression. Exists because the higher-order-function formulation
  * (`aggregate(zip_with(...))`) evaluates its lambdas interpreted, outside
  * whole-stage codegen, and cosine is the per-pair kernel of every
  * verify/score stage in the ANN, semantic-dedup and decontamination
  * paths — the hottest scalar in the embedding half of the engine. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "cosine_sim"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.computeBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CosineSim.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = $cls.computeBoxed($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
