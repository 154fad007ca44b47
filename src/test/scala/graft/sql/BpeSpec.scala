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
    // "t h" stays 2 single-byte tokens — the pair is in different words
    assert(count("t h") == 2L)
    // leading/trailing/multiple whitespace contributes nothing
    assert(count("  the   ") == 1L)
    assert(count("") == 0L)
    assert(count("   ") == 0L)
  }

  test("byte-level: multi-byte UTF-8 counts bytes, NULL stays NULL") {
    // 'é' is 2 UTF-8 bytes, no merges touch them
    assert(count("é") == 2L)
    val r = Seq((1L, "the"), (2L, null.asInstanceOf[String])).toDF("id", "t")
      .select(org.apache.spark.sql.functions.col("id"),
        graft.functions.bpe_count(org.apache.spark.sql.functions.col("t"), merges).as("n"))
      .orderBy("id").collect()
    assert(r(0).getLong(1) == 1L && r(1).isNullAt(1))
  }

  test("empty merge list degrades to byte count per word") {
    assert(count("hello world", Nil) == 10L)
  }
}
