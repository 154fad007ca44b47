package org.apache.spark.sql.graft

import _root_.graft.core.{SimHash, Shingles}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pipeline-operator scalar expressions beyond the reference surface:
  * SimHash, Hamming distance, rolling/winnowed document fingerprints.
  * Deterministic, null-intolerant, built on the same FxHash64 core as the
  * lsh_* functions.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "simhash64"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any =
    SimHash.simhash64(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

case class HammingDist(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "hamming_dist"
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    SimHash.hamming(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** min_fingerprint(text, k): minimum FxHash64 over all k-code-point windows. */
case class MinFingerprint(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "min_fingerprint"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    LshParams.checkConstant(Seq(right -> "k"))
  }
  @transient private lazy val k = LshParams.evalLong(right, "k").toInt
  override protected def nullSafeEval(v: Any, kv: Any): Any =
    SimHash.minFingerprint(v.asInstanceOf[UTF8String].toString, k)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** shingle_hashes(text, w): the sorted distinct u32 FxHash shingle set of
  * the text's w-code-point windows — the same set every lsh_min band
  * minimizes over (shingleset.rs:24-35) and lsh_jaccard intersects,
  * exposed as a column so set-level operators (n-gram overlap /
  * decontamination joins) can explode and join on shingle identity.
  * Ascending order is part of the contract (deterministic output). */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "shingle_hashes"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    LshParams.checkConstant(Seq(right -> "ngram_width"))
  }
  @transient private lazy val w = LshParams.evalLong(right, "ngram_width").toInt
  override protected def nullSafeEval(v: Any, wv: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    new GenericArrayData(Shingles.sortedShinglesUtf8(bytes, 0, bytes.length, w))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** winnow_fingerprint(text, k, w): winnowed k-gram fingerprint set. */
case class WinnowFingerprint(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def prettyName: String = "winnow_fingerprint"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (!base.isInstanceOf[TypeCheckSuccess.type]) return base
    LshParams.checkConstant(Seq(second -> "k", third -> "w"))
  }
  @transient private lazy val k = LshParams.evalLong(second, "k").toInt
  @transient private lazy val w = LshParams.evalLong(third, "w").toInt
  override protected def nullSafeEval(v: Any, kv: Any, wv: Any): Any =
    new GenericArrayData(SimHash.winnow(v.asInstanceOf[UTF8String].toString, k, w))
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** unicode_norm(text, form): Unicode normalization (NFC/NFD/NFKC/NFKD) via
  * the JDK's `java.text.Normalizer` — the canonicalization step a
  * multilingual dedup pipeline must run BEFORE hashing: NFC "é" (U+00E9)
  * and NFD "e"+U+0301 render identically but share no byte, so every
  * downstream identity — shingle sets, MinHash bands, gram hashes, exact
  * dedup — silently treats them as different text. Unicode normalization
  * forms are stable across conforming implementations (UAX #15 stability
  * policy), which is what lets the NFC gate pin this cross-engine against
  * DuckDB's `nfc_normalize` bit-for-bit. NULL → NULL; already-normalized
  * strings pass through unchanged (Normalizer short-circuits on its own
  * quick-check, so the common ASCII path is cheap). `form` is a
  * construction-time constant — no per-row dispatch. */
case class UnicodeNorm(child: Expression, form: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be one of NFC, NFD, NFKC, NFKD — got '$form'")

  override def prettyName: String = "unicode_norm"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    UnicodeNorm.normalize(v.asInstanceOf[UTF8String], form)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val mod = s"${classOf[UnicodeNorm].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, c => s"""${ev.value} = $mod.normalize($c, "$form");""")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** idn_ascii_host(host): fold an (already [[graft.api.Domains.urlHost]]
  * -normalized) host to ONE ASCII identity — the IDN twins rule real
  * crawl URL sets carry: `münchen.de`, `M%C3%BCnchen.de` and
  * `xn--mnchen-3ya.de` are the same host three ways. Per label:
  * percent-decode ALL `%XX` triplets (UTF-8, malformed bytes →
  * U+FFFD — deterministic, mirroring Python `unquote(errors=
  * 'replace')`), lowercase (root locale), NFC-normalize, then encode
  * any non-ASCII label as `xn--` + RFC 3492 Punycode
  * ([[graft.core.Punycode]]); an ASCII label (including an existing
  * `xn--`) passes through, so both spellings converge. This is BARE
  * identity folding — IDNA's stringprep registration profile
  * (prohibited codepoints, bidi rules, ß→ss) is deliberately NOT
  * applied: the goal is that equal-looking hosts collapse, not that
  * invalid registrations are rejected. NULL → NULL. */
case class IdnAsciiHost(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "idn_ascii_host"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    IdnAsciiHost.toAsciiHost(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val mod = s"${classOf[IdnAsciiHost].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, c => s"""${ev.value} = $mod.toAsciiHost($c);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object IdnAsciiHost {
  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Static call target for interpreted eval and generated code. */
  def toAsciiHost(s: UTF8String): UTF8String = {
    val raw = s.toString
    // percent-decode all %XX triplets to bytes; malformed '%' passes
    // through literally (the pctNormalize convention)
    val decoded =
      if (raw.indexOf('%') < 0) raw
      else {
        val buf = new java.io.ByteArrayOutputStream(raw.length)
        var i = 0
        while (i < raw.length) {
          val c = raw.charAt(i)
          if (c == '%' && i + 2 < raw.length &&
              hexVal(raw.charAt(i + 1)) >= 0 && hexVal(raw.charAt(i + 2)) >= 0) {
            buf.write(hexVal(raw.charAt(i + 1)) * 16 + hexVal(raw.charAt(i + 2)))
            i += 3
          } else {
            // write surrogate PAIRS together — a lone half would encode
            // as the replacement byte and split an astral codepoint
            val end =
              if (Character.isHighSurrogate(c) && i + 1 < raw.length &&
                Character.isLowSurrogate(raw.charAt(i + 1))) i + 2
              else i + 1
            buf.write(raw.substring(i, end)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            i = end
          }
        }
        new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
      }
    val folded = java.text.Normalizer.normalize(
      decoded.toLowerCase(java.util.Locale.ROOT),
      java.text.Normalizer.Form.NFC)
    val labels = folded.split("\\.", -1).map { lab =>
      // DNS caps labels at 63 octets; 255 codepoints is already far
      // outside any valid host. Past that, the RFC 3492 delta
      // arithmetic (guardless by design — see Punycode's scaladoc)
      // could overflow Int and emit a WRONG encoding that collides
      // distinct junk hosts — pass such labels through unchanged
      // instead: junk keeps its own identity.
      if (lab.length > 255 || lab.codePoints().allMatch(_ < 128)) lab
      else "xn--" + graft.core.Punycode.encode(lab)
    }
    UTF8String.fromString(labels.mkString("."))
  }
}

/** levenshtein_cp(a, b): Levenshtein edit distance over Unicode CODE
  * POINTS — the record-linkage verifier semantics
  * ([[graft.api.BandedLsh.editVerifiedPairs]]). Exists to OWN the unit:
  * DuckDB's builtin counts BYTE edits ('à' = 2 bytes, inflating
  * every non-ASCII distance), and Spark's builtin unit is the engine's
  * choice (Spark 4 counts code points — spec-measured — but that is
  * inherited behavior, not a pinned contract). Code points are the unit
  * a similarity threshold over human-readable keys means; they also
  * match Python's string DP, which is what the unicode gate cross-pins.
  * Classic two-row DP, O(|a|·|b|) — for SHORT key columns, like the
  * operator it verifies. NULL → NULL. */
case class LevenshteinCp(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "levenshtein_cp"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    LevenshteinCp.dist(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val mod = s"${classOf[LevenshteinCp].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $mod.dist($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object LevenshteinCp {
  /** Static call target for interpreted eval and generated code. */
  def dist(a: UTF8String, b: UTF8String): Int = {
    val ca = a.toString.codePoints().toArray
    val cb = b.toString.codePoints().toArray
    if (ca.length == 0) return cb.length
    if (cb.length == 0) return ca.length
    var prev = new Array[Int](cb.length + 1)
    var cur = new Array[Int](cb.length + 1)
    var j = 0
    while (j <= cb.length) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= ca.length) {
      cur(0) = i
      var k = 1
      while (k <= cb.length) {
        val sub = prev(k - 1) + (if (ca(i - 1) == cb(k - 1)) 0 else 1)
        cur(k) = math.min(math.min(prev(k) + 1, cur(k - 1) + 1), sub)
        k += 1
      }
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(cb.length)
  }
}

/** html_extract(html): deterministic HTML → text extraction — tag strip
  * with block-element line breaks, script/style/comment removal, entity
  * decode, whitespace normalization ([[graft.core.HtmlText]], where the
  * scan rules are specified; the Python oracle re-derives them
  * independently). The front-end stage of a web-curation pipeline: its
  * output lines are block structure, which is what the line-level
  * operators (boilerplate df, Gopher line rules) consume. NULL → NULL;
  * codegen is one static call — no UDF, no regex chain. */
case class HtmlExtract(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def prettyName: String = "html_extract"
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override protected def nullSafeEval(v: Any): Any =
    HtmlExtract.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val mod = s"${classOf[HtmlExtract].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $mod.extract($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HtmlExtract {
  /** Static call target for interpreted eval and generated code. */
  def extract(s: UTF8String): UTF8String =
    UTF8String.fromString(_root_.graft.core.HtmlText.extract(s.toString))
}

object UnicodeNorm {
  /** Static call target for interpreted eval and generated code. The form
    * resolves via a compile-time string switch, not per-row
    * `Form.valueOf` reflection — this sits on the hot pre-identity
    * canonicalization path. */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = form match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case _ => java.text.Normalizer.Form.NFKD
    }
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, f))
  }
}
