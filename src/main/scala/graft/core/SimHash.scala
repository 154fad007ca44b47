package graft.core

/** SimHash and rolling-fingerprint kernels for near-dup detection at scale —
  * additions beyond the reference surface (it ships only MinHash/Euclidean
  * LSH + Jaccard; these cover the SimHash and document-fingerprint rows of a
  * training-data pipeline). Hashing reuses the engine-wide FxHash64 so the
  * whole fingerprint column derives from one documented hash family.
  */
object SimHash {

  /** FxHash64 of one token's code points (length-prefixed, like the shingle
    * hash but without the u32 truncation). */
  def tokenHash(cps: Array[Int], len: Int): Long = {
    var h = FxHash.add(0L, len.toLong)
    var i = 0
    while (i < len) {
      h = FxHash.add(h, cps(i).toLong & 0xffffffffL)
      i += 1
    }
    h
  }

  /** 64-bit SimHash over whitespace tokens: each token votes its hash bits
    * (+1 for a set bit, -1 for clear); result bit b is 1 iff the vote sum is
    * positive. Empty input → 0L. */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && text.charAt(i) != ' ') i += 1
      if (i > start) {
        val token = text.substring(start, i)
        val cps = Shingles.codePoints(token)
        val h = tokenHash(cps, cps.length)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two SimHash values. */
  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Rolling k-gram fingerprint: FxHash64 every k-code-point window and keep
    * the minimum (unsigned) — a 1-word document sketch; equal texts agree,
    * and heavy overlap makes agreement likely. Shorter-than-k input → 0L. */
  def minFingerprint(text: String, k: Int): Long = {
    val cps = Shingles.codePoints(text)
    val n = cps.length - k + 1
    if (n <= 0) return 0L
    var best = -1L // u64::MAX
    val window = new Array[Int](k)
    var i = 0
    while (i < n) {
      System.arraycopy(cps, i, window, 0, k)
      val h = tokenHash(window, k)
      if (java.lang.Long.compareUnsigned(h, best) < 0) best = h
      i += 1
    }
    best
  }

  /** Winnowed fingerprint set: the minimum k-gram hash of every window of
    * `w` consecutive k-gram positions, the window SLIDING by one position
    * (classic winnowing; Schleimer et al. 2003 §2, rightmost minimum per
    * window), deduplicated, ascending unsigned order.
    *
    * Sliding — not tiling — is what makes the fingerprint content-position
    * robust: a one-character prefix insertion shifts every k-gram position,
    * but each selected minimum is a local property of w adjacent k-grams, so
    * all windows not touching the edit still select the same hash and the
    * two fingerprint sets overlap in all but O(1) elements. (A tiled scan —
    * `start += w` — is alignment-sensitive: the same insertion moves every
    * tile boundary and can replace the entire set.) Fewer than w k-grams →
    * one window over all of them. Bounded size (expected 2n/(w+1) distinct
    * selections), the practical doc-fingerprint for 100 TB near-dup mining. */
  def winnow(text: String, k: Int, w: Int): Array[Long] = {
    val cps = Shingles.codePoints(text)
    val n = cps.length - k + 1
    if (n <= 0) return Array.empty
    val hashes = new Array[Long](n)
    val window = new Array[Int](k)
    var i = 0
    while (i < n) {
      System.arraycopy(cps, i, window, 0, k)
      hashes(i) = tokenHash(window, k)
      i += 1
    }
    val out = new java.util.TreeSet[java.lang.Long]((a, b) => java.lang.Long.compareUnsigned(a, b))
    // Rightmost-minimum sliding scan. O(n·w) worst case with w a small
    // constant (16 in doc_signatures) — the branch-free inner loop beats a
    // monotonic deque's allocation churn at these widths.
    var start = 0
    val lastStart = math.max(0, n - w)
    while (start <= lastStart) {
      val end = math.min(start + w, n)
      var best = hashes(start)
      var j = start + 1
      while (j < end) {
        // <= : later position wins ties (robust winnowing's rightmost rule)
        if (java.lang.Long.compareUnsigned(hashes(j), best) <= 0) best = hashes(j)
        j += 1
      }
      out.add(best)
      start += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var idx = 0
    while (it.hasNext) { arr(idx) = it.next(); idx += 1 }
    arr
  }
}
