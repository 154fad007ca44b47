package graft.api

import graft.TestSpark
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE trainer: dict-based merge learning (Sennrich et al.),
  * deterministic tie-breaks, the min-count-2 stop, the vocab cap, and the
  * trained-ranks -> bpe_count composition (including the byte-token
  * no-double-encode path for multi-byte UTF-8). */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trainOnDict: merges cascade — hand-computed abab") {
    // "abab" x3: pairs (a,b)=6 (two occurrences x count), (b,a)=3 ->
    // merge (a,b) everywhere -> [ab, ab]; then (ab,ab)=3 -> [abab]; done.
    val m = BpeTrain.trainOnDict(Array(("abab", 3L)), numMerges = 5)
    assert(m == Seq(("a", "b"), ("ab", "ab")))
  }

  test("trainOnDict: count ties break on pair bytes ascending") {
    // (a,b) and (c,d) both count 2 -> (a,b) first, then (c,d).
    val m = BpeTrain.trainOnDict(Array(("ab", 2L), ("cd", 2L)), numMerges = 2)
    assert(m == Seq(("a", "b"), ("c", "d")))
  }

  test("trainOnDict: a pair seen once is noise — training stops below count 2") {
    assert(BpeTrain.trainOnDict(Array(("xy", 1L)), numMerges = 10).isEmpty)
    // and the stop is per-round: the count-2 pair still merges first
    val m = BpeTrain.trainOnDict(Array(("xy", 1L), ("pq", 2L)), numMerges = 10)
    assert(m == Seq(("p", "q")))
  }

  test("incremental trainer == full-recount reference on randomized dicts") {
    // the incremental pair-count maintenance must be BIT-identical to the
    // naive recount at every merge — same best-pair order, same overlap
    // counting (runs like "aaa"), same min-count-2 stop. Randomized words
    // over a 4-letter alphabet make heavy ties, overlaps and cascades.
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 20) {
      val dict = Array.fill(30 + rnd.nextInt(120)) {
        val len = 1 + rnd.nextInt(12)
        val w = Array.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString
        (w, 1L + rnd.nextInt(9).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toArray
        .sortBy { case (w, c) => (-c, w) }
      val merges = 1 + rnd.nextInt(200)
      val fast = BpeTrain.trainOnDict(dict, merges)
      val slow = BpeTrain.trainOnDictNaive(dict, merges)
      assert(fast == slow,
        s"trial $trial (merges=$merges, dict=${dict.length}): first " +
          s"divergence at ${fast.zip(slow).indexWhere(p => p._1 != p._2)}")
    }
  }

  test("wordCounts: exact counts, whitespace split, cap keeps most frequent") {
    val docs = Seq("the cat  the", "the\tdog").toDF("text")
    val all = BpeTrain.wordCounts(docs, "text", 10).as[(String, Long)].collect().toMap
    assert(all == Map("the" -> 3L, "cat" -> 1L, "dog" -> 1L))
    val capped = BpeTrain.wordCounts(docs, "text", 1).as[(String, Long)].collect()
    assert(capped.toSeq == Seq(("the", 3L)))
  }

  test("trainBpe distributed == trainOnDict of the hand-built dict") {
    val docs = Seq("low low lower", "low lowest newer", "newer wider").toDF("text")
    val learned = BpeTrain.trainBpe(docs, "text", numMerges = 8)
    val dict = Array(("low", 3L), ("lower", 1L), ("lowest", 1L),
      ("newer", 2L), ("wider", 1L)).sortBy { case (w, c) => (-c, w) }
    assert(learned == BpeTrain.trainOnDict(dict, 8))
    assert(learned.nonEmpty)
  }

  test("trainedRanks -> bpe_count: multi-byte UTF-8 tokens survive the round trip") {
    // corpus is three copies of the 2-char word "\u00e9\u00e9" (bytes C3 A9 C3 A9):
    // merge 1 = (C3, A9), merge 2 = (C3A9, C3A9) -> the whole word is ONE
    // token. Double-encoding the trained byte tokens (the UTF-8 compile
    // path) would make the second merge unmatchable.
    val docs = Seq("\u00e9\u00e9", "\u00e9\u00e9", "\u00e9\u00e9").toDF("text")
    val merges = BpeTrain.trainBpe(docs, "text", numMerges = 4)
    assert(merges.map { case (a, b) => (a.length, b.length) } == Seq((1, 1), (2, 2)))
    val ranks = BpeTrain.trainedRanks(docs, "text", numMerges = 4)
    val n = docs.select(graft.functions.bpe_count(col("text"), ranks).as("n"))
      .as[Long].collect()
    assert(n.toSeq == Seq(1L, 1L, 1L))
  }

  test("mergesDf serializes rank order") {
    val df = BpeTrain.mergesDf(spark, Seq(("a", "b"), ("ab", "c")))
    assert(df.columns.toSeq == Seq("rank", "left", "right"))
    assert(df.orderBy("rank").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq == Seq((0L, "a", "b"), (1L, "ab", "c")))
  }
}
