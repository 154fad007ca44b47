package graft.core

/** RFC 3492 Punycode ENCODING (§6.3) — the bootstring transform behind
  * `xn--` internationalized host labels. Hand-derived from the RFC's
  * pseudocode so the Python oracle (CPython's independent `punycode`
  * codec, also RFC 3492) pins it cross-engine bit-for-bit — the
  * [[FxHash]] two-independent-implementations discipline applied to
  * URL identity.
  *
  * Only the encoder: identity folding canonicalizes BOTH the unicode
  * and the already-`xn--` form of a host label TO the ASCII form, so a
  * decoder is never needed (`münchen.de` → `xn--mnchen-3ya.de`;
  * `xn--mnchen-3ya.de` is already there). Overflow guards are omitted
  * deliberately: host labels are ≤63 octets by DNS rule and the gate's
  * inputs are orders of magnitude below the RFC's 2³¹ bound. */
object Punycode {
  private val Base = 36
  private val TMin = 1
  private val TMax = 26
  private val Skew = 38
  private val Damp = 700
  private val InitialBias = 72
  private val InitialN = 128

  private def adapt(d0: Int, numPoints: Int, firstTime: Boolean): Int = {
    var delta = if (firstTime) d0 / Damp else d0 / 2
    delta += delta / numPoints
    var k = 0
    while (delta > ((Base - TMin) * TMax) / 2) {
      delta /= Base - TMin
      k += Base
    }
    k + (Base - TMin + 1) * delta / (delta + Skew)
  }

  private def digitChar(d: Int): Char =
    if (d < 26) ('a' + d).toChar else ('0' + d - 26).toChar

  /** Encode one label's codepoints (RFC 3492 §6.3). The caller owns the
    * `xn--` prefix and the decision WHETHER to encode (an all-ASCII
    * label must not be). */
  def encode(label: String): String = {
    val cps = label.codePoints().toArray
    val out = new StringBuilder
    cps.foreach(c => if (c < InitialN) out.append(c.toChar))
    val b = out.length
    var h = b
    if (b > 0) out.append('-')
    var n = InitialN
    var delta = 0
    var bias = InitialBias
    while (h < cps.length) {
      var m = Int.MaxValue
      cps.foreach(c => if (c >= n && c < m) m = c)
      delta += (m - n) * (h + 1)
      n = m
      cps.foreach { c =>
        if (c < n) delta += 1
        else if (c == n) {
          var q = delta
          var k = Base
          var done = false
          while (!done) {
            val t =
              if (k <= bias) TMin
              else if (k >= bias + TMax) TMax
              else k - bias
            if (q < t) done = true
            else {
              out.append(digitChar(t + (q - t) % (Base - t)))
              q = (q - t) / (Base - t)
              k += Base
            }
          }
          out.append(digitChar(q))
          bias = adapt(delta, h + 1, h == b)
          delta = 0
          h += 1
        }
      }
      delta += 1
      n += 1
    }
    out.toString
  }
}
