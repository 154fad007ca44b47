package graft.core

import java.util.concurrent.ConcurrentHashMap

/** Seeded random-hyperplane (sign) LSH family for cosine similarity — the
  * third classic family next to MinHash (Jaccard) and p-stable (Euclidean).
  * `nbits` hyperplane normals are drawn N(0,1) from the engine's [[StdRng]]
  * in bit-major order (for each bit, d components — the order the Python
  * oracle mirrors); bit i of the sketch is 1 iff `x · dir_i >= 0`.
  * P(bit agrees) = 1 − θ/π for angle θ, so sketch Hamming distance
  * estimates the angle and equal bit-chunks block candidates exactly like
  * SimHash's pigeonhole banding.
  *
  * Derived once per (nbits, seed, d) per JVM and cached — same pattern and
  * reasoning as [[EuclideanFamily]]. The dot product accumulates k
  * ascending; ties (dot exactly 0.0, e.g. the zero vector) set the bit. */
final class CosineFamily(val nbits: Int, val seed: Long, val d: Int) {
  require(nbits >= 1 && nbits <= 64, s"nbits must be in [1, 64], got $nbits")

  /** Row-major [nbits * d] hyperplane normals. */
  val dirs: Array[Double] = {
    val rng = new StdRng(seed)
    val a = new Array[Double](nbits * d)
    var i = 0
    while (i < a.length) { a(i) = rng.stdNormal(); i += 1 }
    a
  }

  def sketch(x: Array[Double]): Long = {
    var bits = 0L
    var b = 0
    while (b < nbits) {
      var acc = 0.0
      var k = 0
      while (k < d) { acc += x(k) * dirs(b * d + k); k += 1 }
      if (acc >= 0.0) bits |= (1L << b)
      b += 1
    }
    bits
  }
}

object CosineFamily {
  private val cache = new ConcurrentHashMap[(Int, Long, Int), CosineFamily]()

  def apply(nbits: Int, seed: Long, d: Int): CosineFamily =
    cache.computeIfAbsent((nbits, seed, d), k => new CosineFamily(k._1, k._2, k._3))
}
