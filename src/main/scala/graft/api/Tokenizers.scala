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
    * Arabic, digits all survive), EXCEPT Han ideographs, which become one
    * token per character (CJK has no space boundaries — per-character
    * tokens are what make fixed-width grams meaningful there, the same
    * granularity CJK IR systems default to). Implementation: space-pad
    * every Han char, then split on non-letter/digit runs — both steps are
    * plain Java-regex built-ins, and the identical two-step is expressible
    * in DuckDB RE2 (`\p{Han}` / `[^\p{L}\p{N}]`), which is what lets the
    * driver gate verify this tokenizer cross-engine. */
  val unicodeWords: Column => Column =
    c => filter(split(regexp_replace(lower(c), "(\\p{IsHan})", " $1 "),
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
    * actually run the pass; note [[Dedup.cutDupSpans]]' rebuilt text under
    * this tokenizer is the space-joined token stream, not prose — use it
    * for span DETECTION and stats, and cut with a word tokenizer when the
    * output must be text. */
  def bpe(merges: Seq[(String, String)]): Column => Column =
    c => graft.functions.bpe_tokens(c, merges)
}
