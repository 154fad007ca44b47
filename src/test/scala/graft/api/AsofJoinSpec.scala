package graft.api

import java.sql.Timestamp

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(min: Int) = new Timestamp(60000L * min)

  test("asof picks most recent right row at-or-before, null when none") {
    import spark.implicits._
    val trades = Seq(
      (1L, "A", ts(10)), (2L, "A", ts(20)), (3L, "A", ts(5)),
      (4L, "B", ts(10)), (5L, "C", ts(10)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(8), 100.0), ("A", ts(20), 105.0), ("A", ts(25), 110.0),
      ("B", ts(11), 50.0))
      .toDF("sym", "ts", "px")
    val got = AsofJoin.asof(trades, quotes, Seq("sym"), "ts", Seq("px"))
      .orderBy("trade_id").collect()
    // trade 1 @10 -> quote @8 (100); trade 2 @20 -> quote @20 inclusive (105)
    // trade 3 @5 -> none; trade 4 @10 -> none (quote is @11); trade 5 -> no key
    assert(got(0).getDouble(3) == 100.0)
    assert(got(1).getDouble(3) == 105.0)
    assert(got(2).isNullAt(3))
    assert(got(3).isNullAt(3))
    assert(got(4).isNullAt(3))
  }

  test("asof attaches all values from the SAME right row, keeping its nulls") {
    import spark.implicits._
    val events = Seq((1L, "A", ts(30))).toDF("event_id", "sym", "ts")
    // most recent right row @20 has px = NULL and qty = 7; the older row @10
    // has px = 99. A per-column carry would wrongly attach px = 99 (from the
    // @10 row) next to qty = 7 (from the @20 row); row semantics require
    // (NULL, 7) — the @20 row as-is.
    val quotes = Seq(
      ("A", ts(10), Some(99.0), Some(1L)),
      ("A", ts(20), None, Some(7L)))
      .toDF("sym", "ts", "px", "qty")
    val got = AsofJoin.asof(events, quotes, Seq("sym"), "ts", Seq("px", "qty")).collect()
    assert(got.length == 1)
    assert(got(0).isNullAt(3), s"px must be the @20 row's NULL, got ${got(0)}")
    assert(got(0).getLong(4) == 7L)
  }

  test("range join: exact boundaries, bucketed plan, no nested loop") {
    import spark.implicits._
    val points = Seq((1L, 0.0), (2L, 24999.99), (3L, 25000.0), (4L, 109999.0), (5L, 999999.0))
      .toDF("id", "v")
    val bands = Seq((1L, 0.0, 25000.0), (2L, 25000.0, 110000.0)).toDF("band_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, bands, "v", "lo", "hi", 25000.0)
      .select("id", "band_id").orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // 25000.0 is exclusive in band 1, inclusive in band 2; 999999 matches none
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L)))
    val plan = RangeJoin.pointInInterval(points, bands, "v", "lo", "hi", 25000.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must be bucketed, not nested-loop:\n$plan")
  }

  test("asof plan has no nested-loop pair explosion") {
    import spark.implicits._
    val l = Seq((1L, "k", ts(1))).toDF("id", "key", "ts")
    val r = Seq(("k", ts(0), 1.0)).toDF("key", "ts", "v")
    val plan = AsofJoin.asof(l, r, Seq("key"), "ts", Seq("v"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"asof must not cross-product:\n$plan")
  }
}
