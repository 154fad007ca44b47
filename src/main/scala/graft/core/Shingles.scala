package graft.core

/** Character-n-gram shingling, bit-exact to the reference's `ShingleSet`
  * (/root/reference/src/minhash/shingleset.rs).
  *
  * The reference iterates Rust `char`s = Unicode scalar values
  * (shingleset.rs:27-31); JVM Strings are UTF-16, so we expand to code points
  * first (surrogate pair = one shingle element), SURVEY.md §7.5.2.
  * Each window of `ngramWidth` code points is FxHash64-hashed with Rust
  * slice framing and truncated to u32 (shingleset.rs:37-47). The reference's
  * salt hook (shingleset.rs:12-47, always None from its SQL surface) is
  * mirrored as an `Option[String]` default-None parameter: a salted hasher
  * state is derived once per set via [[FxHash.saltState]] and every window
  * hash resumes from it.
  * Strings shorter than `ngramWidth` produce an empty set (windows() yields
  * nothing) — all-bands-collide footgun documented in SURVEY.md §2.2.4.
  */
object Shingles {

  /** Expand a String to Unicode code points. */
  def codePoints(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var ci = 0
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(ci)
      out(i) = cp
      ci += Character.charCount(cp)
      i += 1
    }
    out
  }

  /** Decode UTF-8 bytes straight to code points — the hot path used by the
    * Catalyst expressions, avoiding a UTF-16 String round trip. Spark
    * guarantees valid UTF-8 in `UTF8String`, and Rust `chars()` over a
    * `&str` yields exactly these scalar values (shingleset.rs:27). */
  def codePointsUtf8(bytes: Array[Byte], offset: Int, len: Int): Array[Int] = {
    val out = new Array[Int](len) // upper bound; trimmed by caller via count
    var i = offset
    val end = offset + len
    var n = 0
    while (i < end) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) { out(n) = b0; i += 1 }
      else if (b0 < 0xe0) { out(n) = ((b0 & 0x1f) << 6) | (bytes(i + 1) & 0x3f); i += 2 }
      else if (b0 < 0xf0) {
        out(n) = ((b0 & 0x0f) << 12) | ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
        i += 3
      } else {
        out(n) = ((b0 & 0x07) << 18) | ((bytes(i + 1) & 0x3f) << 12) |
          ((bytes(i + 2) & 0x3f) << 6) | (bytes(i + 3) & 0x3f)
        i += 4
      }
      n += 1
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Shingle set over UTF-8 bytes (hot path; same semantics as fromText). */
  def fromTextUtf8(bytes: Array[Byte], offset: Int, len: Int, ngramWidth: Int,
                   salt: Option[String] = None): IntHashSet = {
    val st = FxHash.saltState(salt)
    val cps = codePointsUtf8(bytes, offset, len)
    val set = new IntHashSet(math.max(8, cps.length))
    val n = cps.length - ngramWidth + 1
    val window = new Array[Int](ngramWidth)
    var i = 0
    while (i < n) {
      System.arraycopy(cps, i, window, 0, ngramWidth)
      set.add(FxHash.hashCodePointsSalted(st, window, ngramWidth))
      i += 1
    }
    set
  }

  /** Shingle set of all `ngramWidth`-code-point windows (shingleset.rs:24-35). */
  def fromText(s: String, ngramWidth: Int, salt: Option[String] = None): IntHashSet = {
    val st = FxHash.saltState(salt)
    val cps = codePoints(s)
    val set = new IntHashSet(math.max(8, cps.length))
    val n = cps.length - ngramWidth + 1
    val window = new Array[Int](ngramWidth)
    var i = 0
    while (i < n) {
      System.arraycopy(cps, i, window, 0, ngramWidth)
      set.add(FxHash.hashCodePointsSalted(st, window, ngramWidth))
      i += 1
    }
    set
  }

  /** Shingle set from caller-provided shingle strings: each string hashed
    * whole as its code-point sequence (shingleset.rs:12-22). */
  def fromShingles(shingles: Iterator[String], salt: Option[String] = None): IntHashSet = {
    val st = FxHash.saltState(salt)
    val set = new IntHashSet(16)
    while (shingles.hasNext) {
      val s = shingles.next()
      val cps = codePoints(s)
      set.add(FxHash.hashCodePointsSalted(st, cps, cps.length))
    }
    set
  }

  /** Shingle set as a sorted (unsigned) int array — the cache-friendly form
    * for repeated pairwise Jaccard: 4 bytes per shingle and intersection by
    * linear merge instead of hash probes. Same set, different layout. */
  def sortedShinglesUtf8(bytes: Array[Byte], offset: Int, len: Int, ngramWidth: Int): Array[Int] = {
    val arr = fromTextUtf8(bytes, offset, len, ngramWidth).toArray
    // sort by unsigned value (flip sign bit -> natural order)
    var i = 0
    while (i < arr.length) { arr(i) = arr(i) ^ Int.MinValue; i += 1 }
    java.util.Arrays.sort(arr)
    arr
  }

  /** Jaccard over two sorted shingle arrays (merge-count); either empty → 0.0. */
  def jaccardSorted(a: Array[Int], b: Array[Int]): Double = {
    if (a.length == 0 || b.length == 0) return 0.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i)
      val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** Exact Jaccard |A∩B|/|A∪B| over shingle sets; either side empty → 0.0
    * (shingleset.rs:49-57). */
  def jaccard(a: IntHashSet, b: IntHashSet): Double = {
    if (a.size == 0 || b.size == 0) 0.0
    else {
      val inter = a.intersectionSize(b)
      val union = a.size + b.size - inter
      inter.toDouble / union.toDouble
    }
  }

  /** Fused text-to-text Jaccard (lsh_jaccard semantics, minhash.rs:236-296). */
  def jaccardText(a: String, b: String, ngramWidth: Int): Double =
    jaccard(fromText(a, ngramWidth), fromText(b, ngramWidth))
}
