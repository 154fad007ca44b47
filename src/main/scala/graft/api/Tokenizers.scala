package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Tokenizer seam for the token-level operators (the [[Dedup]] dup-span
  * family). A tokenizer is `Column[string] => Column[array<string>]` built
  * from codegen'd built-ins only — it runs inside the scan's
  * WholeStageCodegen span, so swapping tokenizers never changes the
  * distributed shape of the operator that consumes it.
  *
  * Why a seam: exact-substring dedup (Lee et al. 2022) is defined over a
  * TOKEN stream, and the token identity decides what the pass can see. An
  * `[a-z]+`-only stream silently drops digits, accented Latin, and all CJK
  * text — i.e. most of a real multilingual pretraining corpus.
  */
object Tokenizers {

  /** ASCII word tokenizer (the original dup-span default, kept for gate
    * stability): lowercase, maximal `[a-z]+` runs, everything else is a
    * separator. Digits and non-ASCII letters are NOT tokens. */
  val asciiWords: Column => Column =
    c => filter(split(lower(c), "[^a-z]+"), t => t =!= lit(""))

  /** Unicode word tokenizer: lowercase; tokens are maximal runs of Unicode
    * letters+digits (`\p{L}\p{N}` — accented Latin, Greek, Cyrillic,
    * Arabic, digits all survive), EXCEPT the scripts written WITHOUT space
    * boundaries — Han ideographs, Japanese kana, Hangul, Thai, and (round
    * 13) Khmer, Lao, Myanmar, Tibetan — which become one token per
    * character (per-character tokens are what make fixed-width grams
    * meaningful where no delimiter exists, the same granularity CJK IR
    * systems default to; Korean prose does space-break, but agglutinated
    * particles make per-syllable grams the robust choice). Combining
    * vowel/tone marks (Thai U+0E49, Khmer coeng U+17D2, Myanmar asat
    * U+103A, Tibetan vowels...) are category Mn/Mc, so the split step
    * drops them — a gram identity over base characters, identical in both
    * engines (probe-verified: Java and DuckDB RE2 emit the same stream
    * for all nine script classes). Spacing vowels classified Lo (e.g. Lao
    * U+0EB2) survive as their own tokens in both engines. Implementation:
    * space-pad every no-boundary-script char, then split on
    * non-letter/digit runs — both steps are plain Java-regex built-ins,
    * and the identical two-step is expressible in DuckDB RE2 (script
    * classes `\p{Han}\p{Hiragana}` etc. / `[^\p{L}\p{N}]`), which is what
    * lets the driver gate verify this tokenizer cross-engine. (Java
    * `\p{IsX}` is the BLOCK, RE2 `\p{X}` the SCRIPT — they agree on the
    * core block of each of these scripts; the divergent code points are
    * the rare extension blocks, e.g. Myanmar Extended-A/B, which fall
    * back to run-tokens.) */
  val unicodeWords: Column => Column =
    c => filter(split(regexp_replace(lower(c),
      "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}\\p{IsThai}" +
        "\\p{IsKhmer}\\p{IsLao}\\p{IsMyanmar}\\p{IsTibetan}])", " $1 "),
      "[^\\p{L}\\p{N}]+"), t => t =!= lit(""))

  /** [[unicodeWords]] with NFC canonicalization first
    * ([[graft.functions.unicode_norm]]): NFC "é" and NFD "e"+U+0301 render
    * identically but tokenize to different byte sequences under any
    * byte/codepoint tokenizer — so a corpus mixing normalization forms
    * (the normal state of web text) silently under-detects duplicate
    * spans. This is the tokenizer to use when inputs aren't already
    * canonicalized; it only differs from [[unicodeWords]] on
    * non-NFC input (spec-pinned). */
  val unicodeWordsNFC: Column => Column =
    c => unicodeWords(graft.functions.unicode_norm(c, "NFC"))

  /** Byte-level BPE tokenizer under a caller-supplied merge list
    * ([[graft.functions.bpe_tokens]]): token identity = the merged byte
    * token itself (the dup-span operators hash space-joined token windows,
    * so any array<string> stream plugs in, and BPE tokens never contain
    * whitespace). Detection over BPE tokens matches how Lee et al.
    * actually run the pass. Cut with [[Dedup.cutSpansBpe]] /
    * [[Dedup.cutDupSpansBpe]] (byte-level detokenizing rebuild) — the
    * generic word-tokenizer cut would space-join byte tokens into token
    * soup. */
  def bpe(merges: Seq[(String, String)]): Column => Column =
    c => graft.functions.bpe_tokens(c, merges)
}
