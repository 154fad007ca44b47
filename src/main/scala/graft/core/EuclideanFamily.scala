package graft.core

import java.util.concurrent.ConcurrentHashMap

/** The seeded p-stable (Gaussian) LSH family for `lsh_euclidean`/
  * `lsh_euclidean32`, bit-exact to /root/reference/src/euclidean_hash.rs +
  * euclidean_hash/euclidean_hasher.rs.
  *
  * Per band (in stream order, euclidean_hash.rs:86-91): draw
  * A ∈ R^{d×bandSize} row-major ~ N(0,1), then b ∈ [0, r)^{bandSize}
  * (euclidean_hasher.rs:16-26). Band value = FxHash64 of the u64 vector
  * `ceil((x·A + b)/r)` with Rust's saturating f64→u64 cast and ndarray's
  * Hash framing: shape slice ([bandSize]: length prefix 1 then the dim),
  * then the elements (euclidean_hasher.rs:28-38, SURVEY.md §2.4.2).
  *
  * The reference re-derives this family per ROW (RNG reset, SURVEY §2.2.3);
  * we derive once per (r, bandCount, bandSize, seed, d) and cache — identical
  * output (SURVEY §4.4). The dot product accumulates k ascending, matching
  * ndarray's sequential accumulation (verified on goldens at d=5; risk at
  * larger d noted in SURVEY §7.5.3).
  */
final class EuclideanFamily(
    val r: Double, val bandCount: Int, val bandSize: Int, val seed: Long, val d: Int) {

  /** Per band: A flattened row-major [d*bandSize], then b [bandSize]. */
  val (as, bs): (Array[Array[Double]], Array[Array[Double]]) = {
    val aArr = new Array[Array[Double]](bandCount)
    val bArr = new Array[Array[Double]](bandCount)
    val rng = new StdRng(seed)
    var band = 0
    while (band < bandCount) {
      val a = new Array[Double](d * bandSize)
      var i = 0
      while (i < a.length) { a(i) = rng.stdNormal(); i += 1 }
      val b = new Array[Double](bandSize)
      var j = 0
      while (j < bandSize) { b(j) = rng.uniformF64(0.0, r); j += 1 }
      aArr(band) = a
      bArr(band) = b
      band += 1
    }
    (aArr, bArr)
  }

  /** Rust `f64 as u64`: saturating, NaN → 0 (SURVEY §2.4.8). */
  @inline private def f64ToU64(x: Double): Long = {
    if (!(x > 0.0)) 0L // NaN or <= 0
    else if (x >= 1.8446744073709552e19) -1L // >= 2^64 → u64::MAX
    else if (x < 9.223372036854775807e18) x.toLong
    else (x - 9.223372036854775808e18).toLong | Long.MinValue
  }

  /** Band hashes (u64 bit patterns) for one vector of length d. */
  def hash(x: Array[Double]): Array[Long] = {
    val out = new Array[Long](bandCount)
    var band = 0
    while (band < bandCount) {
      val a = as(band)
      val b = bs(band)
      var h = FxHash.add(FxHash.add(0L, 1L), bandSize.toLong) // ndarray shape hash
      var j = 0
      while (j < bandSize) {
        var acc = 0.0
        var k = 0
        while (k < d) {
          acc += x(k) * a(k * bandSize + j)
          k += 1
        }
        val v = f64ToU64(math.ceil((acc + b(j)) / r))
        h = FxHash.add(h, v)
        j += 1
      }
      out(band) = h
      band += 1
    }
    out
  }
}

object EuclideanFamily {
  private val cache = new ConcurrentHashMap[(Double, Int, Int, Long, Int), EuclideanFamily]()

  def apply(r: Double, bandCount: Int, bandSize: Int, seed: Long, d: Int): EuclideanFamily =
    cache.computeIfAbsent((r, bandCount, bandSize, seed, d),
      k => new EuclideanFamily(k._1, k._2, k._3, k._4, k._5))
}
