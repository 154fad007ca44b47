package graft.core

/** Minimal open-addressing hash set of Int (the u32 shingle values), built for
  * the hot per-row path: no boxing, no iterator allocation. Mirrors the role of
  * the reference's `IntSet<u32>` (nohash) in shingleset.rs:7-9 — only
  * membership/dedup matters; iteration order is irrelevant to every consumer
  * (minima and set-cardinality are order-independent, SURVEY.md §2.2).
  */
final class IntHashSet(initialCapacity: Int = 16) {
  private var cap = Integer.highestOneBit(math.max(initialCapacity, 8) * 2 - 1) << 1
  private var mask = cap - 1
  private var keys = new Array[Int](cap)
  private var used = new Array[Boolean](cap)
  private var count = 0

  def size: Int = count

  @inline private def spread(k: Int): Int = {
    // Any decent mix works; internal layout is never observable.
    val h = k * 0x9e3779b9
    (h ^ (h >>> 16)) & mask
  }

  def add(k: Int): Boolean = {
    var i = spread(k)
    while (used(i)) {
      if (keys(i) == k) return false
      i = (i + 1) & mask
    }
    keys(i) = k
    used(i) = true
    count += 1
    if (count * 4 > cap * 3) grow()
    true
  }

  def contains(k: Int): Boolean = {
    var i = spread(k)
    while (used(i)) {
      if (keys(i) == k) return true
      i = (i + 1) & mask
    }
    false
  }

  private def grow(): Unit = {
    val oldKeys = keys
    val oldUsed = used
    cap <<= 1
    mask = cap - 1
    keys = new Array[Int](cap)
    used = new Array[Boolean](cap)
    count = 0
    var i = 0
    while (i < oldKeys.length) {
      if (oldUsed(i)) add(oldKeys(i))
      i += 1
    }
  }

  /** Dense copy of the members (order unspecified). */
  def toArray: Array[Int] = {
    val out = new Array[Int](count)
    var i = 0
    var j = 0
    while (i < cap) {
      if (used(i)) { out(j) = keys(i); j += 1 }
      i += 1
    }
    out
  }

  /** |this ∩ other| — iterate the smaller side. */
  def intersectionSize(other: IntHashSet): Int = {
    if (other.size < size) return other.intersectionSize(this)
    var n = 0
    var i = 0
    while (i < cap) {
      if (used(i) && other.contains(keys(i))) n += 1
      i += 1
    }
    n
  }
}
