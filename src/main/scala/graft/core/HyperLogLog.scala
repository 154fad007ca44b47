package graft.core

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007), pinned to a
  * cross-engine-deterministic subset so an independent re-derivation can
  * match it bit-for-bit:
  *
  *   - hash family: the engine-wide FxHash64 token hash
  *     ([[SimHash.tokenHash]] — length-prefixed code points), not a
  *     JVM-private hash;
  *   - register index = top `p` hash bits, rho = leading zeros of the
  *     remaining 64-p bits + 1 (all-zero remainder → 64-p+1);
  *   - estimator: the RAW harmonic-mean estimate alpha_m * m^2 / sum_j
  *     2^-M_j, summed in register-index order. Each 2^-M_j term is an exact
  *     power of two (computed as 1.0 / (1L << M_j), never Math.pow) and
  *     IEEE addition is correctly rounded, so the fixed-order sum — and
  *     therefore the whole estimate — is bit-identical across engines. The
  *     small-range linear-counting correction is deliberately omitted: it
  *     needs ln(), which JVM/libc implementations round differently. Same
  *     determinism-over-polish trade as the log-free tf-idf score. At the
  *     pipeline's operating range (vocabularies ≫ 2.5·m) raw HLL is the
  *     recommended estimator anyway; standard error ≈ 1.04/sqrt(m).
  *
  * The register array is the mergeable state: update is a per-register max,
  * so the sketch is insensitive to row order and partitioning — the property
  * that makes it a one-pass, shuffle-light distinct count at 100 TB (m bytes
  * per group cross the wire instead of the value set).
  */
object HyperLogLog {

  val MinP = 4
  val MaxP = 16

  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Fold one 64-bit hash into the register array (m = registers.length = 2^p). */
  def add(registers: Array[Byte], hash: Long, p: Int): Unit = {
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rho =
      if (w == 0L) (64 - p + 1).toByte
      else (java.lang.Long.numberOfLeadingZeros(w) + 1).toByte
    if (rho > registers(idx)) registers(idx) = rho
  }

  /** Elementwise max of `other` into `acc`. */
  def mergeInto(acc: Array[Byte], other: Array[Byte]): Unit = {
    require(acc.length == other.length,
      s"cannot merge HLL sketches of different precision: ${acc.length} vs ${other.length}")
    var i = 0
    while (i < acc.length) {
      if (other(i) > acc(i)) acc(i) = other(i)
      i += 1
    }
  }

  /** Raw harmonic-mean estimate, bit-deterministic (doc above). */
  def rawEstimate(registers: Array[Byte]): Double = {
    val m = registers.length
    var sum = 0.0
    var i = 0
    while (i < m) {
      // registers(i) <= 64-p+1 <= 61 for p >= 4, so the shift never overflows
      sum += 1.0 / (1L << registers(i)).toDouble
      i += 1
    }
    alpha(m) * m.toDouble * m.toDouble / sum
  }
}
