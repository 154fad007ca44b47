package graft.api

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DomainsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("urlHost normalizes case and strips ONE leading www.") {
    val got = Seq(
      "https://WWW.Example.COM/a",
      "http://example.com/b",
      "https://www.www.example.com/c", // only the first www. strips
      "https://sub.example.com:8080/d" // parse_url HOST excludes the port
    ).toDF("url").select(Domains.urlHost($"url")).as[String].collect()
    assert(got.toSeq == Seq("example.com", "example.com",
      "www.example.com", "sub.example.com"))
  }

  test("normalizedUrl: scheme/fragment drop, trailing slash strips, query stays") {
    val got = Seq(
      "https://www.ex.com/p/1",
      "http://EX.com/p/1/",      // same identity as above
      "https://ex.com/p/1#frag", // fragment is not identity
      "https://ex.com/p/1?q=2",  // query IS identity
      "https://ex.com/p/1/?q=2#x"
    ).toDF("url").select(Domains.normalizedUrl($"url")).as[String].collect()
    assert(got(0) == got(1) && got(1) == got(2))
    assert(got(3) == "ex.com/p/1?q=2" && got(4) == got(3))
  }

  test("dedupByUrl keeps the smallest id per normalized URL") {
    val df = Seq(
      (1L, "https://ex.com/a"),
      (2L, "http://WWW.ex.com/a/"), // same identity as 1
      (3L, "https://ex.com/a?q=1"),
      (4L, "https://ex.com/b"),
      (5L, "https://ex.com/b#s5")   // same identity as 4
    ).toDF("doc_id", "url")
    val kept = Domains.dedupByUrl(df, "url", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L))
  }

  test("domainQuotaSample: deterministic per-host cut, quota binds, non-integral ids refuse") {
    val df = (0L until 300L).map { i =>
      (i, s"https://host${i % 3}.ex.com/p$i")
    }.toDF("doc_id", "url")
    val a = Domains.domainQuotaSample(df, "url", "doc_id", 10, seed = 5L)
      .select("doc_id").as[Long].collect().sorted
    val b = Domains.domainQuotaSample(df, "url", "doc_id", 10, seed = 5L)
      .select("doc_id").as[Long].collect().sorted
    assert(a.toSeq == b.toSeq, "selection must be deterministic")
    assert(a.length == 30, s"quota 10 x 3 hosts, got ${a.length}")
    // per host exactly 10, and they are the 10 smallest (hashScore, id)
    val byHost = a.groupBy(_ % 3)
    assert(byHost.values.forall(_.length == 10))
    // independent re-derivation of the cut via the hashScore column itself
    val scored = df.select($"doc_id",
        Domains.urlHost($"url").as("h"),
        Sampling.hashScore($"doc_id", 5L).as("s"))
      .collect().map(r => (r.getString(1), r.getDouble(2), r.getLong(0)))
    val expect = scored.groupBy(_._1).values.flatMap(
      _.sortBy(x => (x._2, x._3)).take(10).map(_._3)).toArray.sorted
    assert(a.toSeq == expect.toSeq)
    // a different seed selects a different set (sanity that the seed lands)
    val c = Domains.domainQuotaSample(df, "url", "doc_id", 10, seed = 6L)
      .select("doc_id").as[Long].collect().sorted
    assert(c.toSeq != a.toSeq)
    val e = intercept[IllegalArgumentException] {
      Domains.domainQuotaSample(
        df.select(concat(lit("u"), $"doc_id").as("doc_id"), $"url"),
        "url", "doc_id", 10, seed = 5L)
    }
    assert(e.getMessage.contains("integral id column"), e.getMessage)
  }

  test("domainCounts censuses normalized hosts") {
    val df = Seq(
      "https://www.a.com/1", "https://A.com/2", "https://b.com/1"
    ).toDF("url")
    val got = Domains.domainCounts(df, "url")
      .as[(String, Long)].collect().toMap
    assert(got == Map("a.com" -> 2L, "b.com" -> 1L))
  }
}
