package graft.api

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Layout.compact]]: file-count math from on-disk bytes, content
  * identity, and the sorted-compaction mode restoring clustering. */
class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("compaction collapses a fragmented write; content identical") {
    import spark.implicits._
    val tmp = sys.props("java.io.tmpdir")
    val in = s"$tmp/graft_layout_frag"
    val out = s"$tmp/graft_layout_compact"
    val df = (0 until 20000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
    df.repartition(200).write.mode("overwrite").parquet(in)
    val (files0, bytes) = Layout.describeFiles(spark, in)
    assert(files0 == 200)
    val planned = Layout.compact(spark, in, out, targetBytes = bytes / 4)
    val (files1, _) = Layout.describeFiles(spark, out)
    assert(planned >= 4 && planned <= 5, s"planned $planned")
    assert(files1 == planned, s"wrote $files1, planned $planned")
    // identity: same row set
    val a = spark.read.parquet(in).orderBy("id").collect().toSeq
    val b = spark.read.parquet(out).orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("sorted compaction range-partitions: file min/max ranges do not interleave") {
    import spark.implicits._
    val tmp = sys.props("java.io.tmpdir")
    val in = s"$tmp/graft_layout_frag2"
    val out = s"$tmp/graft_layout_sorted"
    val rng = new scala.util.Random(9)
    (0 until 20000).map(_ => (rng.nextLong().abs, rng.nextInt()))
      .toDF("k", "v").repartition(100).write.mode("overwrite").parquet(in)
    val (_, bytes) = Layout.describeFiles(spark, in)
    Layout.compact(spark, in, out, targetBytes = bytes / 8, sortBy = Seq(col("k")))
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, s"overlap in $ranges")
      case _ =>
    }
  }

  test("in-place compaction is refused") {
    intercept[IllegalArgumentException] {
      Layout.compact(spark, "/tmp/x", "/tmp/x", 1024)
    }
    // path ALIASES must be refused too — raw string equality would let a
    // trailing slash or a relative spelling through, and mode("overwrite")
    // would delete the input before reading it
    intercept[IllegalArgumentException] {
      Layout.compact(spark, "/tmp/x", "/tmp/x/", 1024)
    }
    intercept[IllegalArgumentException] {
      Layout.compact(spark, "/tmp/x/../x", "/tmp/x", 1024)
    }
  }
}
