package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled merge table for byte-level BPE (the public GPT-2-family
  * algorithm: tokens start as single bytes; the lowest-rank adjacent pair
  * merges, all occurrences left-to-right, until no listed pair remains).
  *
  * Merge pairs arrive either as UTF-8 strings (`BpeRanks.apply` — the
  * hand-authored form, "t"+"h", "th"+"e") or as already-byte tokens
  * (`fromByteTokens` — what [[graft.api.BpeTrain]] learns); both compile
  * to the same internal byte-token form. Internally a token is a
  * latin-1 `String` (one char per byte, lossless both ways), so pair lookup
  * is one tuple-keyed map hit and a merge is string concat; contrast with
  * byte-array keys, whose equality Java gets wrong silently.
  */
final class BpeRanks private (val byteMerges: Seq[(String, String)]) extends Serializable {
  @transient lazy val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](byteMerges.size * 2)
    byteMerges.zipWithIndex.foreach { case ((a, b), i) => m.put((a, b), i) }
    m
  }
}

object BpeRanks {
  /** Compile a merge list written as UTF-8 strings (the hand-authored /
    * serialized form) — each side is re-read one-char-per-byte. */
  def apply(utf8Merges: Seq[(String, String)]): BpeRanks =
    new BpeRanks(utf8Merges.map { case (a, b) => (latin1(a), latin1(b)) })

  /** Compile a merge list whose sides are ALREADY byte tokens (latin-1
    * strings, one char per raw byte) — the form a trained vocabulary
    * ([[graft.api.BpeTrain]]) produces. Applying the UTF-8 path to these
    * would double-encode any byte ≥ 0x80. */
  def fromByteTokens(pairs: Seq[(String, String)]): BpeRanks = new BpeRanks(pairs)

  /** UTF-8 bytes of `s`, re-read as latin-1: one char per byte (public:
    * the byte-token rendering callers like [[graft.api.BpeTrain]] use). */
  def latin1(s: String): String =
    new String(s.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      java.nio.charset.StandardCharsets.ISO_8859_1)
}

/** `bpe_count(text)` → number of byte-level BPE tokens under a supplied
  * merge list. Words are maximal runs of non-(ASCII-whitespace) bytes of
  * the UTF-8 encoding — the same split a bytes-level `\s+` regex produces —
  * and each word is tokenized independently (merges never cross
  * whitespace, matching every published byte-BPE pre-tokenizer's contract).
  * NULL text → NULL. The count is exactly `len(bpe(word))` summed over
  * words, so a Python re-derivation with the same merges is bit-identical —
  * no model file is bundled; the caller supplies learned merges as data. */
case class BpeCount(child: Expression, ranks: BpeRanks)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "bpe_count"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any): Any =
    BpeCount.countTokens(ranks, v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, classOf[BpeRanks].getName)
    val mod = s"${classOf[BpeCount].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $mod.countTokens($r, $c.getBytes());")
  }

  // BpeRanks is compared by merge list, not identity, so plan equality
  // (subexpression elimination, cached plans) keeps working
  override def equals(o: Any): Boolean = o match {
    case BpeCount(c, r) => c == child && r.byteMerges == ranks.byteMerges
    case _ => false
  }
  override def hashCode(): Int = child.hashCode * 31 + ranks.byteMerges.hashCode

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {
  private[graft] def isWs(b: Byte): Boolean =
    b == 32 || (b >= 9 && b <= 13) // space, \t \n \v \f \r — ASCII \s

  /** Shared by interpreted eval and generated code (static call target). */
  def countTokens(ranks: BpeRanks, utf8: Array[Byte]): Long = {
    var total = 0L
    var i = 0
    val n = utf8.length
    while (i < n) {
      while (i < n && isWs(utf8(i))) i += 1
      val start = i
      while (i < n && !isWs(utf8(i))) i += 1
      if (i > start) total += countWord(ranks, utf8, start, i)
    }
    total
  }

  private[graft] def countWord(ranks: BpeRanks, bytes: Array[Byte], from: Int, until: Int): Int =
    mergeWord(ranks, bytes, from, until)._2

  /** The BPE merge loop itself, shared by count and token emission:
    * returns (token array, live length) — the array may be longer than the
    * live prefix (it is the last merge pass's buffer). Tokens are latin-1
    * strings (one char per raw byte). */
  private[graft] def mergeWord(ranks: BpeRanks, bytes: Array[Byte],
                               from: Int, until: Int): (Array[String], Int) = {
    var toks = new Array[String](until - from)
    var i = from
    while (i < until) {
      toks(i - from) = String.valueOf((bytes(i) & 0xff).toChar)
      i += 1
    }
    val rank = ranks.rank
    var n = toks.length
    while (n > 1) {
      // lowest-rank adjacent pair (ranks are unique, so ties can't happen)
      var best = Integer.MAX_VALUE
      var bi = -1
      var j = 0
      while (j < n - 1) {
        val r = rank.get((toks(j), toks(j + 1)))
        if (r != null && r < best) { best = r; bi = j }
        j += 1
      }
      if (bi < 0) return (toks, n)
      val a = toks(bi)
      val b = toks(bi + 1)
      // merge ALL occurrences of (a, b) left-to-right in one pass — the
      // standard BPE step (merging only the first occurrence is a different
      // algorithm with different counts)
      val out = new Array[String](n)
      var w = 0
      var k = 0
      while (k < n) {
        if (k < n - 1 && toks(k) == a && toks(k + 1) == b) {
          out(w) = a + b; w += 1; k += 2
        } else {
          out(w) = toks(k); w += 1; k += 1
        }
      }
      toks = out
      n = w
    }
    (toks, n)
  }
}

/** `bpe_tokens(text)` → the byte-level BPE token SEQUENCE, as
  * array<string> (words in order, whitespace dropped — same
  * pre-tokenizer contract as [[BpeCount]], so
  * `size(bpe_tokens(t)) == bpe_count(t)` by construction). Token
  * rendering: the token's raw bytes read one-char-per-byte (latin-1) into
  * a string — lossless, so distinct byte sequences stay distinct, and no
  * token can contain whitespace, which makes space-joined token windows
  * (the dup-span gram identity) unambiguous. NULL text → NULL. This is
  * the token stream [[graft.api.Tokenizers.bpe]] feeds to the dup-span
  * family — Lee-et-al-faithful token identity for exact-substring dedup. */
case class BpeTokens(child: Expression, ranks: BpeRanks)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "bpe_tokens"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(v: Any): Any =
    BpeTokens.tokenize(ranks, v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, classOf[BpeRanks].getName)
    val mod = s"${classOf[BpeTokens].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $mod.tokenize($r, $c.getBytes());")
  }

  override def equals(o: Any): Boolean = o match {
    case BpeTokens(c, r) => c == child && r.byteMerges == ranks.byteMerges
    case _ => false
  }
  override def hashCode(): Int = child.hashCode * 31 + ranks.byteMerges.hashCode + 1

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeTokens {
  /** Static call target for interpreted eval and generated code. */
  def tokenize(ranks: BpeRanks,
               utf8: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    val n = utf8.length
    while (i < n) {
      while (i < n && BpeCount.isWs(utf8(i))) i += 1
      val start = i
      while (i < n && !BpeCount.isWs(utf8(i))) i += 1
      if (i > start) {
        val (toks, live) = BpeCount.mergeWord(ranks, utf8, start, i)
        var k = 0
        while (k < live) { buf += UTF8String.fromString(toks(k)); k += 1 }
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
  }
}

/** `bpe_cut(text, spans)` → the document with the spans' BPE tokens CUT
  * and the text rebuilt at the BYTE level — the detokenizing inverse that
  * lets the Lee-et-al-faithful detector ([[BpeTokens]] token identity)
  * drive the destructive edit. `spans` are inclusive 0-based indices over
  * the FLAT token stream [[BpeTokens]] produces for the same text (the
  * dup-span family's position convention), as
  * `array<struct<span_start:bigint,span_end:bigint>>`.
  *
  * Rebuild rule: BPE tokens are byte segments of their word, so within a
  * word the kept tokens' bytes concatenate (the exact inverse of
  * tokenization — a partially-cut word splices its remaining bytes);
  * words contributing no bytes vanish, and surviving words are joined by
  * single spaces. A document with no spans therefore rebuilds as its
  * canonical whitespace-normalized form, matching the word-tokenizer cut
  * convention. Byte-faithful also means byte-faithful to token
  * boundaries: on multi-byte scripts a span edge can split a character —
  * exactly as Lee et al.'s token-level cut can — so outputs are only
  * guaranteed valid UTF-8 where token boundaries respect character
  * boundaries (always true for ASCII).
  *
  * Spans may arrive unsorted (collect_list order); they are sorted here.
  * Overlapping spans are tolerated (a position is cut if ANY span covers
  * it) so long as spans are sorted-disjoint after merge — the
  * [[graft.api.Dedup]] island merge guarantees disjoint. NULL text or
  * NULL spans → NULL (callers coalesce). */
case class BpeCutSpans(left: Expression, right: Expression, ranks: BpeRanks)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StructType}

  override def prettyName: String = "bpe_cut"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    val spansOk = right.dataType match {
      case ArrayType(s: StructType, _) =>
        s.fields.length == 2 &&
          s.fields(0).name == "span_start" && s.fields(0).dataType == LongType &&
          s.fields(1).name == "span_end" && s.fields(1).dataType == LongType
      case _ => false
    }
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: text must be STRING, got ${left.dataType.sql}")
    else if (!spansOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: spans must be ARRAY<STRUCT<span_start: BIGINT, span_end: BIGINT>>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(t: Any, s: Any): Any =
    BpeCutSpans.cut(ranks, t.asInstanceOf[UTF8String].getBytes,
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.addReferenceObj("bpeRanks", ranks, classOf[BpeRanks].getName)
    val mod = s"${classOf[BpeCutSpans].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = $mod.cut($r, $t.getBytes(), $s);")
  }

  override def equals(o: Any): Boolean = o match {
    case BpeCutSpans(l, rr, r) => l == left && rr == right && r.byteMerges == ranks.byteMerges
    case _ => false
  }
  override def hashCode(): Int =
    (left.hashCode * 31 + right.hashCode) * 31 + ranks.byteMerges.hashCode

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeCutSpans {
  /** Static call target for interpreted eval and generated code. */
  def cut(ranks: BpeRanks, utf8: Array[Byte],
          spans: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val ns = spans.numElements()
    val starts = new Array[Long](ns)
    val ends = new Array[Long](ns)
    var i = 0
    var live = 0
    while (i < ns) {
      if (!spans.isNullAt(i)) {
        val row = spans.getStruct(i, 2)
        starts(live) = row.getLong(0)
        ends(live) = row.getLong(1)
        live += 1
      }
      i += 1
    }
    // insertion sort by start — span counts per doc are small (bounded by
    // actual duplication), and collect_list order is nondeterministic
    var a = 1
    while (a < live) {
      val s = starts(a); val e = ends(a)
      var b = a - 1
      while (b >= 0 && starts(b) > s) {
        starts(b + 1) = starts(b); ends(b + 1) = ends(b); b -= 1
      }
      starts(b + 1) = s; ends(b + 1) = e
      a += 1
    }
    val out = new java.io.ByteArrayOutputStream(utf8.length)
    var flat = 0L
    var si = 0
    var wrote = false
    var p = 0
    val n = utf8.length
    while (p < n) {
      while (p < n && BpeCount.isWs(utf8(p))) p += 1
      val ws = p
      while (p < n && !BpeCount.isWs(utf8(p))) p += 1
      if (p > ws) {
        val (toks, liveToks) = BpeCount.mergeWord(ranks, utf8, ws, p)
        var k = 0
        var wordWrote = false
        while (k < liveToks) {
          val idx = flat + k
          while (si < live && ends(si) < idx) si += 1
          val flagged = si < live && starts(si) <= idx && idx <= ends(si)
          if (!flagged) {
            if (!wordWrote) {
              if (wrote) out.write(' ')
              wordWrote = true; wrote = true
            }
            val t = toks(k)
            var c = 0
            while (c < t.length) { out.write(t.charAt(c).toInt & 0xff); c += 1 }
          }
          k += 1
        }
        flat += liveToks
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}

/** `text = word_cut(text, spans)` — the LAYOUT-PRESERVING destructive span
  * cut for spans mined under [[graft.api.Tokenizers.asciiWords]] identity
  * (round 13). The generic word cut ([[graft.api.Dedup.cutSpans]]) rebuilds
  * text as the kept tokens' canonical single-space stream — original
  * whitespace, punctuation, digits and casing are lost even for UNTOUCHED
  * documents. This expression instead cuts by CHARACTER RANGE: token k is
  * the k-th maximal ASCII-letter run of the original bytes (which maps 1:1
  * onto `asciiWords`' k-th token — lowercasing is identity on run
  * boundaries for ASCII, and multi-byte UTF-8 units are all >= 0x80, never
  * letters), and a span [s0, s1] deletes everything from the first byte of
  * run s0 through the last byte of run s1 — separators INSIDE the span go
  * with it; everything outside survives byte-identical. A document with no
  * spans round-trips bit-identical (gate- and spec-pinned).
  *
  * Caveat, documented not guarded: the 1:1 run↔token mapping assumes no
  * non-ASCII character case-folds INTO ASCII letters (the U+212A KELVIN
  * SIGN → 'k' / U+0130 → 'i' anomalies) — on text containing those,
  * `asciiWords`' stream has extra tokens this byte scan cannot see, and
  * positions shift. Mine and cut see the same text, so the practical rule
  * is: spans fed here must come from `asciiWords` over this exact column.
  *
  * Same span conventions as [[BpeCutSpans]]: inclusive 0-based flat token
  * indices, unsorted arrival tolerated (sorted here), disjoint after the
  * island merge, positions past the last token ignored, NULL text or spans
  * → NULL (callers coalesce). */
case class WordCutSpans(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types.{ArrayType, StructType}

  override def prettyName: String = "word_cut"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = {
    val spansOk = right.dataType match {
      case ArrayType(s: StructType, _) =>
        s.fields.length == 2 &&
          s.fields(0).name == "span_start" && s.fields(0).dataType == LongType &&
          s.fields(1).name == "span_end" && s.fields(1).dataType == LongType
      case _ => false
    }
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: text must be STRING, got ${left.dataType.sql}")
    else if (!spansOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: spans must be ARRAY<STRUCT<span_start: BIGINT, span_end: BIGINT>>, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(t: Any, s: Any): Any =
    WordCutSpans.cut(t.asInstanceOf[UTF8String].getBytes,
      s.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mod = s"${classOf[WordCutSpans].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, (t, s) =>
      s"${ev.value} = $mod.cut($t.getBytes(), $s);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordCutSpans {
  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** Static call target for interpreted eval and generated code. */
  def cut(utf8: Array[Byte],
          spans: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val ns = spans.numElements()
    if (ns == 0) return UTF8String.fromBytes(utf8)
    val starts = new Array[Long](ns)
    val ends = new Array[Long](ns)
    var i = 0
    var live = 0
    while (i < ns) {
      if (!spans.isNullAt(i)) {
        val row = spans.getStruct(i, 2)
        starts(live) = row.getLong(0)
        ends(live) = row.getLong(1)
        live += 1
      }
      i += 1
    }
    if (live == 0) return UTF8String.fromBytes(utf8)
    // insertion sort by start — span counts per doc are small (bounded by
    // actual duplication), and collect_list order is nondeterministic
    var a = 1
    while (a < live) {
      val s = starts(a); val e = ends(a)
      var b = a - 1
      while (b >= 0 && starts(b) > s) {
        starts(b + 1) = starts(b); ends(b + 1) = ends(b); b -= 1
      }
      starts(b + 1) = s; ends(b + 1) = e
      a += 1
    }
    val out = new java.io.ByteArrayOutputStream(utf8.length)
    var k = 0L      // token (letter-run) index
    var si = 0
    // true while inside a span whose last token hasn't closed yet — the
    // separators BETWEEN two cut tokens go with the span; the separators
    // flanking the span survive
    var suppress = false
    var p = 0
    val n = utf8.length
    while (p < n) {
      if (!isLetter(utf8(p))) {
        if (!suppress) out.write(utf8(p).toInt)
        p += 1
      } else {
        val runStart = p
        while (p < n && isLetter(utf8(p))) p += 1
        while (si < live && ends(si) < k) si += 1
        val flagged = si < live && starts(si) <= k && k <= ends(si)
        if (!flagged) {
          out.write(utf8, runStart, p - runStart)
          suppress = false
        } else {
          suppress = k < ends(si)
        }
        k += 1
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}
