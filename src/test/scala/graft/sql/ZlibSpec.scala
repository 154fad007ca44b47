package graft.sql

import graft.TestSpark

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** zlib_len: the compression-ratio repetition signal. Pins exact lengths
  * against CPython zlib goldens (both bind the same system zlib — the
  * cross-library determinism the gate relies on), the null/empty contract,
  * and the property the signal exists for: templated text with per-slot
  * variation compresses past the 3x rule while prose does not, even when
  * no line or 2-gram ever repeats. */
class ZlibSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def len1(s: String, level: Int = 6): Long =
    Seq(s).toDF("t")
      .select(graft.functions.zlib_len(col("t"), level)).head().getLong(0)

  test("exact lengths match CPython zlib.compress goldens (level 6)") {
    assert(len1("") == 8L, "empty input is the fixed header+trailer")
    assert(len1("hello world hello world hello world") == 23L)
    assert(len1("the quick brown fox jumps over the lazy dog") == 50L)
    assert(len1("a" * 100) == 12L)
  }

  test("NULL propagates; per-thread Deflater reuse stays deterministic") {
    val r = Seq[Option[String]](Some("abc"), None).toDF("t")
      .select(graft.functions.zlib_len(col("t")).as("n"))
      .collect().map(x => if (x.isNullAt(0)) -1L else x.getLong(0))
    assert(r(1) == -1L, "NULL in, NULL out")
    // many rows through the same reset Deflater: same input, same length
    val many = Seq.fill(500)("the quick brown fox jumps over the lazy dog")
      .toDF("t").select(graft.functions.zlib_len(col("t")).as("n"))
      .distinct().collect()
    assert(many.length == 1 && many.head.getLong(0) == 50L)
  }

  test("length counts UTF-8 BYTES of the input, not chars") {
    // U+00E9 is 2 UTF-8 bytes: the compressed stream must reflect bytes
    val ascii = len1("e" * 64)
    val latin = len1("é" * 64)
    assert(latin > ascii, "2-byte code points compress from a longer input")
  }

  test("template spam trips the 3x integer rule; prose does not") {
    val words = Seq("item", "best", "price", "free", "shipping", "order",
      "now", "satisfaction", "guaranteed", "call", "today", "deal")
    val spam = (1 to 288).map { k =>
      words((k - 1) % 12) + " " + ((7L * 131071 + k * 8191) & 0xFFFF)
    }.mkString(" ")
    // no repeated 2-gram: the slot numbers individualize every pair
    val toks = spam.split(" ")
    val grams = toks.sliding(2).map(_.mkString(" ")).toSeq
    assert(grams.distinct.size == grams.size, "fixture must evade 2-grams")
    val out = graft.api.TextAnalysis
      .compressionSignals(Seq(
        1L -> spam,
        2L -> ("key agg row scan slow fast table value part hash value " +
          "table part a row fast merge batch part value fast spark a a " +
          "the line sort table window table table key"))
        .toDF("doc_id", "text"))
      .select("doc_id", "template_spam").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out(1L), "spam must compress past 3:1")
    assert(!out(2L), "short word-salad prose must stay under the rule")
  }

  test("compressionSignals refuses owned column names case-insensitively") {
    // Spark resolves names case-insensitively by default, so an input
    // 'N_BYTES' would be silently overwritten by withColumn("n_bytes")
    // if the guard compared exactly — ADVICE round 19
    val df = Seq((1L, "text", 7L)).toDF("doc_id", "text", "N_BYTES")
    val e = intercept[IllegalArgumentException] {
      graft.api.TextAnalysis.compressionSignals(df)
    }
    assert(e.getMessage.contains("n_bytes"))
  }
}
