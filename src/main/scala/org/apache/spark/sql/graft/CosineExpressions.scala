package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

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
