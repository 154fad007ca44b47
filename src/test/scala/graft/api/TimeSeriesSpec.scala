package graft.api

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("resampleGapFill: buckets, forward fill, ties, null drop") {
    val events = Seq(
      // key 1: obs at t=0 and t=250; gap bucket [100,200); leading ok
      (1L, ts(10), 5.0, 1L),
      (1L, ts(250), 7.0, 2L),
      // same bucket, same ts: event_id 4 wins (tie-break), not 3
      (1L, ts(250), 9.0, 4L),
      (1L, ts(250), 8.0, 3L),
      // key 2: NULL observation must not create a bucket or block fills
      (2L, ts(50), Double.NaN, 5L),
      (2L, ts(140), 1.5, 6L)
    ).map { case (k, t, v, id) =>
      (k, t, if (v.isNaN) null.asInstanceOf[java.lang.Double] else Double.box(v), id)
    }.toDF("user_id", "ts", "value", "event_id")

    val out = TimeSeries.resampleGapFill(events, "user_id", "ts", "value", 100L, "event_id")
      .orderBy("user_id", "bucket_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)), r.getBoolean(3)))

    assert(out.toSeq == Seq(
      (1L, 0L, Some(5.0), true),     // observed
      (1L, 100L, Some(5.0), false),  // gap forward-filled
      (1L, 200L, Some(9.0), true),   // tie broken by event_id=4
      (2L, 100L, Some(1.5), true)    // NULL obs dropped: grid starts at 100
    ))
  }

  test("valueStats: exact centi-unit moments, negatives floor toward -inf, nulls drop") {
    val df = Seq(
      (Some(1.0), "a"), (Some(2.0), "a"), (Some(4.0), "a"),
      (Some(-0.015), "b"), (None: Option[Double], "b")
    ).toDF("value", "event_type")
    val out = TimeSeries.valueStats(df, Seq("event_type"), "value")
      .orderBy("event_type").collect()
    // group a: x = (100, 200, 400); n=3, mean = 700/3, var = (3*210000-490000)/9
    assert(out(0).getLong(1) == 3L)
    assert(out(0).getDouble(2) == 1.0 && out(0).getDouble(3) == 4.0)
    assert(out(0).getDouble(4) == 700.0 / 3)
    assert(out(0).getDouble(5) == (3.0 * 210000 - 490000) / 9)
    // group b: floor(-1.5) = -2 (toward -inf, matching every SQL floor);
    // the NULL row contributes nothing
    assert(out(1).getLong(1) == 1L && out(1).getDouble(4) == -2.0
      && out(1).getDouble(5) == 0.0)
  }

  test("resampleGapFill: grid spans each key's own range, not the global one") {
    val events = Seq(
      (1L, ts(0), 1.0, 1L), (1L, ts(900), 2.0, 2L),
      (2L, ts(400), 3.0, 3L)
    ).toDF("user_id", "ts", "value", "event_id")
    val out = TimeSeries.resampleGapFill(events, "user_id", "ts", "value", 100L, "event_id")
    assert(out.filter(col("user_id") === 1L).count() == 10) // buckets 0..900
    assert(out.filter(col("user_id") === 2L).count() == 1)  // only bucket 400
    assert(out.filter(!col("observed")).count() == 8)       // key 1's 8 gaps
  }
}
