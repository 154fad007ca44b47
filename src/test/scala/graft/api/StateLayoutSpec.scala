package graft.api

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-22 state-layout optimizations:
  *
  *  - bucketed writes stage through a bucket-aligned strict-width
  *    repartition, so a toy-scale build lands exactly numBuckets files
  *    (one per bucket) instead of input-tasks × buckets near-empty
  *    ones, and every append generation adds at most `width` more —
  *    the small-files floor every later scan of the state tables paid;
  *  - [[SmallTableCache]] serves repeat reads of an unchanged small
  *    table without a Spark job but NEVER serves stale data: any
  *    writer — including one that bypasses the owning operator —
  *    changes the file listing and invalidates. */
class StateLayoutSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def partFiles(table: String): Int = {
    val loc = new java.io.File(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
    loc.listFiles().count(f => f.getName.startsWith("part-"))
  }

  test("bucketAlignedWidth: aligned, byte-scaled, floor of one file per bucket") {
    val tiny = (0L until 100L).toDF("k")
    assert(BucketedWrite.bucketAlignedWidth(tiny, 8) == 8)
    assert(BucketedWrite.bucketAlignedWidth(tiny, 3) == 3)
  }

  test("saveBucketed writes one file per bucket at toy scale; appends stay bounded") {
    val t = "graft_layout_bucketed"
    val df = (0L until 5000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .repartition(4) // simulate a wide upstream
    BucketedWrite.saveBucketed(df, t, 2, Seq("doc_id"))
    assert(partFiles(t) == 2, s"build wrote ${partFiles(t)} files, want 2")
    val gen = (5000L until 6000L).map(i => (i, s"text $i")).toDF("doc_id", "text")
      .repartition(4)
    BucketedWrite.alignedForInsert(gen, t).write.mode("append").insertInto(t)
    assert(partFiles(t) <= 4, s"append grew to ${partFiles(t)} files, want <= 4")
    // content survives the staging exchange
    assert(spark.table(t).count() == 6000L)
    BucketedWrite.dropTable(spark, t)
  }

  test("SmallTableCache: repeat reads served, ANY writer invalidates") {
    val t = "graft_stc_spec"
    BucketedWrite.dropTable(spark, t)
    Seq(("a", 1L)).toDF("key", "value").write.saveAsTable(t)
    var reads = 0
    def readIt(): Map[String, Long] =
      SmallTableCache.cached(spark, t, "spec") {
        reads += 1
        spark.table(t).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      }
    assert(readIt() == Map("a" -> 1L) && reads == 1)
    assert(readIt() == Map("a" -> 1L) && reads == 1, "unchanged table re-read")
    // a DIRECT external append (bypassing the owning operator — the
    // torn-state spec's shape) must be seen on the very next read
    Seq(("b", 2L)).toDF("key", "value").write.mode("append").insertInto(t)
    assert(readIt() == Map("a" -> 1L, "b" -> 2L) && reads == 2,
      "stale cache served after an external write")
    // drop + recreate at the same location is also seen
    BucketedWrite.dropTable(spark, t)
    Seq(("c", 3L)).toDF("key", "value").write.saveAsTable(t)
    assert(readIt() == Map("c" -> 3L) && reads == 3)
    BucketedWrite.dropTable(spark, t)
  }
}
