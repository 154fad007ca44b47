package graft.sql

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val merges = Seq(("t", "h"), ("th", "e"), ("e", "r"), ("the", "r"))

  private def count(text: String, m: Seq[(String, String)] = merges): Long =
    Seq(Tuple1(text)).toDF("t")
      .select(graft.functions.bpe_count(org.apache.spark.sql.functions.col("t"), m))
      .collect()(0).getLong(0)

  test("merges cascade and apply in rank order") {
    // "the" = t h e -> (t,h)=th e -> (th,e)=the : 1 token
    assert(count("the") == 1L)
    // "ther": th e r; (th,e) outranks (e,r) -> the r -> (the,r) -> 1 token
    assert(count("ther") == 1L)
    // "er" alone: (e,r) applies -> 1 token
    assert(count("er") == 1L)
    // "threr": t h r e r -> th r e r -> (e,r) -> th r er : 3 tokens
    assert(count("threr") == 3L)
    // no applicable merges: one token per byte
    assert(count("abc") == 3L)
  }

  test("lowest-rank pair merges ALL occurrences in one pass") {
    // "ethe": e t h e -> merge (t,h) everywhere -> e th e -> (th,e) -> e the
    assert(count("ethe") == 2L)
    // overlapping occurrences consume left-to-right: "ththth" ->
    // th th th (3), no further merges
    assert(count("ththth") == 3L)
  }

  test("words split on ASCII whitespace; merges never cross it") {
    assert(count("the the\tthe\nthe") == 4L)
    // "t h" stays 2 single-byte tokens \u2014 the pair is in different words
    assert(count("t h") == 2L)
    // leading/trailing/multiple whitespace contributes nothing
    assert(count("  the   ") == 1L)
    assert(count("") == 0L)
    assert(count("   ") == 0L)
  }

  test("byte-level: multi-byte UTF-8 counts bytes, NULL stays NULL") {
    // '\u00e9' is 2 UTF-8 bytes, no merges touch them
    assert(count("\u00e9") == 2L)
    val r = Seq((1L, "the"), (2L, null.asInstanceOf[String])).toDF("id", "t")
      .select(org.apache.spark.sql.functions.col("id"),
        graft.functions.bpe_count(org.apache.spark.sql.functions.col("t"), merges).as("n"))
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 1L && r(1).isNullAt(1))
  }

  test("empty merge list degrades to byte count per word") {
    assert(count("hello world", Nil) == 10L)
  }

  private def cut(text: String, spans: Seq[(Long, Long)],
                  m: Seq[(String, String)] = merges): String = {
    import org.apache.spark.sql.functions._
    val df = spans.toDF("span_start", "span_end")
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("s"))
      .withColumn("t", lit(text))
    df.select(graft.functions.bpe_cut(col("t"), col("s"), m))
      .collect()(0).getString(0)
  }

  test("bpe_cut: no spans rebuilds the canonical whitespace-normalized text") {
    assert(cut("  the   quick\tther  ", Nil) == "the quick ther")
  }

  test("bpe_cut: cutting a whole word's tokens removes the word and its space") {
    // "the quick the" -> tokens: [the] [q,u,i,c,k] [the]; cut flat index 0
    assert(cut("the quick the", Seq((0L, 0L))) == "quick the")
    // cut the trailing word (flat index 6)
    assert(cut("the quick the", Seq((6L, 6L))) == "the quick")
    // cut everything -> empty string
    assert(cut("the quick the", Seq((0L, 6L))) == "")
  }

  test("bpe_cut: a partially-cut word splices its remaining bytes") {
    // "ther quick": under merges, "ther" -> [ther] (1 token)... use "thx":
    // [th, x] \u2014 cutting token 0 leaves the bytes "x" of the same word
    assert(cut("thx quick", Seq((0L, 0L))) == "x quick")
    // cutting token 1 (the x) leaves "th"
    assert(cut("thx quick", Seq((1L, 1L))) == "th quick")
  }

  test("bpe_cut: byte rebuild is exact on multi-byte UTF-8 in kept regions") {
    // "\u00e9" is 2 bytes = 2 single-byte tokens under these merges; keep it,
    // cut the 'the' token after it \u2014 the rebuilt bytes decode exactly
    // tokens: [0xc3][0xa9] [the] \u2192 cut flat index 2
    assert(cut("\u00e9 the", Seq((2L, 2L))) == "\u00e9")
  }

  test("bpe_cut: spans arrive unsorted and overlapping without harm") {
    assert(cut("the quick the", Seq((6L, 6L), (0L, 0L))) == "quick")
    assert(cut("the quick the", Seq((0L, 3L), (2L, 6L))) == "")
  }
}
