package graft.api

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Each Gopher structural rule exercised INDEPENDENTLY: every failing
  * fixture doc trips exactly one rule (hand-checked against the pinned
  * single-space / newline word and line conventions — note a word
  * adjacent to a `\n` keeps the `\n` inside it, so fixtures place
  * newlines between standalone tokens where word identity matters). */
class GopherRulesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // thresholds sized for hand-computable fixtures
  private def run(docs: Seq[(Long, String)]) =
    TextAnalysis.gopherRules(docs.toDF("doc_id", "text"),
        minWords = 5L, maxWords = 20L,
        minMeanWordLen = 2.0, maxMeanWordLen = 10.0,
        maxSymbolWordRatio = 0.5, maxBulletLineFrac = 0.5,
        maxEllipsisLineFrac = 0.5, minAlphaWordFrac = 0.5,
        minStopwordHits = 1)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a plain prose doc passes every rule") {
    val m = run(Seq(1L -> "the cat sat on a mat"))
    assert(m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Long]("n_words") == 6L)
    assert(m(1L).getAs[Double]("mean_word_len") == 15.0 / 6.0)
    assert(m(1L).getAs[Long]("stopword_hits") == 1L) // "the"
  }

  test("word-count bounds: too few and too many words each fail alone") {
    val m = run(Seq(
      1L -> "the cat",                          // 2 < 5
      2L -> ("the " + Seq.fill(20)("ab").mkString(" ")))) // 21 > 20
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Long]("n_words") == 2L)
    assert(!m(2L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Long]("n_words") == 21L)
  }

  test("mean word length bounds fail alone (gibberish runs and single-char noise)") {
    val m = run(Seq(
      1L -> ("the aaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbbbb " +
        "cccccccccccccccccccc dddddddddddddddddddd"), // 83/5 = 16.6 > 10
      2L -> "the a b c d e"))                          // 8/6 = 1.33 < 2
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Double]("mean_word_len") == 83.0 / 5.0)
    assert(!m(2L).getAs[Boolean]("keep"))
    assert(m(2L).getAs[Double]("mean_word_len") == 8.0 / 6.0)
  }

  test("symbol-to-word ratio fails alone (# debris)") {
    val m = run(Seq(1L -> "the ## cat ## sat ## of"))
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Double]("symbol_word_ratio") == 6.0 / 7.0)
  }

  test("bullet-line fraction fails alone; - * and \\u2022 all count as bullets") {
    val m = run(Seq(1L -> "\u2022 x\n- y z\nthe of and be to have"))
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Double]("bullet_line_frac") == 2.0 / 3.0)
    assert(m(1L).getAs[Long]("stopword_hits") == 5L)
  }

  test("ellipsis-ended line fraction fails alone (truncated scrapes)") {
    val m = run(Seq(1L -> "the cat sat...\nof and be to have..."))
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Double]("ellipsis_line_frac") == 1.0)
    // the two '...' also count as symbols but stay under the 0.5 ratio
    assert(m(1L).getAs[Double]("symbol_word_ratio") == 2.0 / 7.0)
  }

  test("alphabetic-word fraction fails alone (tables of numbers)") {
    val m = run(Seq(1L -> "the 12 34 56 78 90"))
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Double]("alpha_word_frac") == 1.0 / 6.0)
  }

  test("stopword floor fails alone (not prose at all)") {
    val m = run(Seq(1L -> "cat dog fox run jump"))
    assert(!m(1L).getAs[Boolean]("keep"))
    assert(m(1L).getAs[Long]("stopword_hits") == 0L)
  }

  test("empty and wordless docs keep=false with null ratios") {
    val m = run(Seq(1L -> "", 2L -> "   "))
    Seq(1L, 2L).foreach { id =>
      assert(!m(id).getAs[Boolean]("keep"))
      assert(m(id).getAs[Long]("n_words") == 0L)
      assert(m(id).isNullAt(m(id).fieldIndex("mean_word_len")))
    }
  }

  test("per-lang dispatch: non-English prose passes under its own list, fails English-only") {
    import spark.implicits._
    val prose = (1 to 15).map(_ => "palabra bonita historia cuenta").mkString(" ")
    val docs = Seq(
      (1L, s"el la de $prose", "es"),   // es stopwords present -> keep
      (2L, prose, "es"),                // no es stopwords -> fail own list
      (3L, s"der die und $prose", "de"),
      (4L, s"the of and that $prose", "pt"), // unmapped lang -> en fallback
      (5L, s"el la de $prose", "pt")    // fallback = en -> es words don't count
    ).toDF("doc_id", "text", "lang")
    val perLang = TextAnalysis.gopherRulesPerLang(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(perLang(1L).getAs[Boolean]("keep"),
      "es doc with es stopwords must pass its own list")
    assert(!perLang(2L).getAs[Boolean]("keep") &&
      perLang(2L).getAs[Long]("stopword_hits") == 0L)
    assert(perLang(3L).getAs[Boolean]("keep"))
    assert(perLang(4L).getAs[Boolean]("keep"),
      "unmapped lang must fall back to the fallback list")
    assert(!perLang(5L).getAs[Boolean]("keep"))
    // the same es doc FAILS wholesale under the English-only suite —
    // the exact behavior the per-lang seam exists to fix
    val enOnly = TextAnalysis.gopherRules(docs)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!enOnly(1L).getAs[Boolean]("keep") &&
      enOnly(1L).getAs[Long]("stopword_hits") == 0L)
  }

  test("per-lang dispatch survives ANSI mode for unmapped languages") {
    import spark.implicits._
    // under ANSI (the Spark 4 default) element_at on a map THROWS for
    // missing keys, making the fallback unreachable — the dispatch must
    // use try_element_at so unmapped langs reach the en fallback under
    // BOTH settings (pinned by forcing the conf on for this call)
    val prose = (1 to 15).map(_ => "palabra bonita historia cuenta").mkString(" ")
    val docs = Seq((1L, s"the of and that $prose", "zh")).toDF("doc_id", "text", "lang")
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val m = TextAnalysis.gopherRulesPerLang(docs)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      assert(m(1L).getAs[Boolean]("keep"),
        "unmapped lang under ANSI must dispatch to the fallback list, not throw")
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("per-lang guards: fallback must be mapped, lists non-empty") {
    import spark.implicits._
    val df = Seq((1L, "x", "en")).toDF("doc_id", "text", "lang")
    val e1 = intercept[IllegalArgumentException] {
      TextAnalysis.gopherRulesPerLang(df, fallbackLang = "xx")
    }
    assert(e1.getMessage.contains("fallbackLang"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.gopherRulesPerLang(df,
        stopwords = Map("en" -> Seq.empty[String]))
    }
    assert(e2.getMessage.contains("non-empty"), e2.getMessage)
  }
}
