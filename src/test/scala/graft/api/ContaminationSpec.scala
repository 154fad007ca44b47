package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ContaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  private def shingleSet(text: String, w: Int): Set[Int] = {
    val b = text.getBytes("UTF-8")
    graft.core.Shingles.sortedShinglesUtf8(b, 0, b.length, w).toSet
  }

  test("sharedNgrams counts are exact distinct shingle intersections") {
    val bench = Sampling.sampleByHash(docs, "doc_id", 0.1, 99L)
    val flagged = Contamination.sharedNgrams(docs, bench, "doc_id", "text", 8, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(flagged.nonEmpty, "fixture has near-dups; expected flagged pairs")
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    flagged.take(20).foreach { case (d, b, n) =>
      assert(d != b, "benchmark docs must not flag themselves")
      val expect = (shingleSet(texts(d), 8) & shingleSet(texts(b), 8)).size
      assert(n == expect, s"pair ($d,$b): got $n, recomputed $expect")
      assert(n >= 10)
    }
  }

  test("removeContaminated drops exactly the flagged docs") {
    val bench = Sampling.sampleByHash(docs, "doc_id", 0.1, 99L)
    val flaggedIds = Contamination.sharedNgrams(docs, bench, "doc_id", "text", 8, 10L)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    val clean = Contamination.removeContaminated(docs, bench, "doc_id", "text", 8, 10L)
    assert(clean.count() == docs.count() - flaggedIds.size)
    val remaining = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(remaining.intersect(flaggedIds).isEmpty)
  }

  test("the corpus side broadcast-joins the benchmark shingles (no corpus shuffle)") {
    val bench = Sampling.sampleByHash(docs, "doc_id", 0.1, 99L)
    val plan = Contamination.sharedNgrams(docs, bench, "doc_id", "text", 8, 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not sort-merge:\n$plan")
  }

  test("bloom-pruned path is bit-identical to sharedNgrams, even under heavy fp") {
    val bench = Sampling.sampleByHash(docs, "doc_id", 0.1, 99L)
    val exact = Contamination.sharedNgrams(docs, bench, "doc_id", "text", 8, 10L)
      .orderBy("doc_id", "bench_id").collect().toSeq
    // log2m=8 (256 bits, k=1) is deliberately undersized: most probes come
    // back might_contain=true, so this exercises fp survival through the
    // pre-filter AND their elimination by the exact join
    for (log2m <- Seq(8, 20); bcast <- Seq(true, false)) {
      val pruned = Contamination.sharedNgramsBloomPruned(
          docs, bench, "doc_id", "text", 8, 10L, log2m = log2m, k = 1,
          broadcastExact = bcast)
        .orderBy("doc_id", "bench_id").collect().toSeq
      assert(pruned == exact,
        s"log2m=$log2m broadcastExact=$bcast diverged from the exact path")
    }
  }

  test("bloom probe filters the corpus before the exact join reaches it") {
    val bench = Sampling.sampleByHash(docs, "doc_id", 0.1, 99L)
    val plan = Contamination.sharedNgramsBloomPruned(
        docs, bench, "doc_id", "text", 8, 10L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_contains"),
      s"map-side bloom probe missing from plan:\n$plan")
    // The eagerly-built bloom is a binary LITERAL, so the probe must be a
    // plain Filter in the corpus stage — no join machinery (the lazy
    // crossJoin(broadcast) form planned as a codegen-breaking
    // BroadcastNestedLoopJoin). And it must sit BELOW the exact join
    // (executed plans print top-down), or it prunes nothing.
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bloom probe must not need a nested-loop join:\n$plan")
    val lines = plan.linesIterator.toSeq
    val probeAt = lines.indexWhere(l =>
      l.contains("Filter") && l.contains("bloom_contains"))
    val exactJoinAt = lines.indexWhere(l =>
      l.contains("Join") && l.contains("[sh") && !l.contains("bloom_contains"))
    assert(probeAt >= 0, s"bloom probe must be a Filter in the corpus stage:\n$plan")
    assert(exactJoinAt >= 0 && exactJoinAt < probeAt,
      s"exact join must consume the bloom-pruned stream:\n$plan")
  }
}
