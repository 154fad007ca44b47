package graft.core

import java.util.concurrent.ConcurrentHashMap

/** The seeded MinHash family for `lsh_min`/`lsh_min32`.
  *
  * Semantics (bit-exact to /root/reference/src/minhash.rs:72-75 +
  * minhash/minhasher.rs): the reference re-creates
  * `StdRng::seed_from_u64(seed)` for EVERY row and, per band, draws
  * `bandSize` seeds ~ Uniform[0, 20_000_000) u64 — so every row sees the same
  * hash family (SURVEY.md §2.2.3). We exploit that purity and derive the
  * seeds ONCE per (bandCount, bandSize, seed), cached process-wide
  * (SURVEY.md §4.4) — identical output, O(rows·RNG) less work.
  *
  * Per band: band value = FxHash64 over the `bandSize` per-seed minima, where
  * each minimum is min over shingles of FxHash64(seed:u64, shingle:u32);
  * empty shingle set leaves every minimum at u64::MAX (minhasher.rs:22-45).
  */
final class MinHashFamily(val bandCount: Int, val bandSize: Int, val seed: Long) {
  /** Flat [bandCount * bandSize] seed array, band-major — band i uses draws
    * [i*bandSize, (i+1)*bandSize) of the stream (minhash.rs:73-75). */
  val seeds: Array[Long] = {
    val rng = new StdRng(seed)
    val out = new Array[Long](bandCount * bandSize)
    var i = 0
    while (i < out.length) {
      out(i) = rng.uniformU64(20000000L)
      i += 1
    }
    out
  }

  /** Band hashes (u64 bit patterns) for one shingle set. */
  def hash(set: IntHashSet): Array[Long] = {
    val shingles = set.toArray
    val out = new Array[Long](bandCount)
    var b = 0
    while (b < bandCount) {
      var h = 0L // band accumulator: FxHash over the minima, no length prefix
      var j = 0
      while (j < bandSize) {
        val s = seeds(b * bandSize + j)
        var m = -1L // u64::MAX
        var k = 0
        while (k < shingles.length) {
          val v = FxHash.hash2(s, shingles(k).toLong & 0xffffffffL)
          if (java.lang.Long.compareUnsigned(v, m) < 0) m = v
          k += 1
        }
        h = FxHash.add(h, m)
        j += 1
      }
      out(b) = h
      b += 1
    }
    out
  }
}

object MinHashFamily {
  private val cache = new ConcurrentHashMap[(Int, Int, Long), MinHashFamily]()

  def apply(bandCount: Int, bandSize: Int, seed: Long): MinHashFamily =
    cache.computeIfAbsent((bandCount, bandSize, seed),
      k => new MinHashFamily(k._1, k._2, k._3))
}
