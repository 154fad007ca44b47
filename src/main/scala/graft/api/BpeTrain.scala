package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BpeRanks

/** Byte-level BPE vocabulary TRAINING (Sennrich et al. 2016, the classic
  * dictionary-based trainer; the byte-level variant is the GPT-2-family
  * algorithm). The engine's BPE apply-side kernels
  * ([[org.apache.spark.sql.graft.BpeCount]] / `BpeTokens` / `BpeCutSpans`)
  * treat the merge list as caller-supplied DATA — this is the missing
  * producer: learn that list from the corpus itself.
  *
  * Scale shape (the part that must survive 100 TB):
  *   1. ONE map-side-combined aggregate builds the word-frequency dict —
  *      `explode(split(text))` → `groupBy(word).count`. No other pass over
  *      the corpus ever happens, regardless of merge count.
  *   2. The dict is capped at `vocabCap` entries via TakeOrderedAndProject
  *      (top-K per partition, K-merge on the driver — no global sort
  *      shuffle), keeping driver state bounded by the cap, not the corpus.
  *   3. Merge training runs on the driver over the capped dict —
  *      O(vocabCap · avgWordLen · numMerges), corpus-size-independent.
  *      This is exactly how the published trainers work (the dict, not the
  *      corpus, is what BPE iterates over); a distributed per-iteration
  *      corpus pass would be numMerges shuffles for no extra fidelity.
  *
  * Determinism (cross-engine, for the Python-mirror oracle):
  *   - the dict cut orders by (count DESC, UTF-8 bytes ASC) — binary sort,
  *     engine-independent (UTF-16 string order would diverge from Python's
  *     code-point order on supplementary characters);
  *   - the best pair each round is (count DESC, pair bytes ASC) — counts
  *     can tie, so the tie-break is part of the contract;
  *   - pair counts are the naive adjacent scan (overlapping occurrences in
  *     runs like "aaa" each count), matching the reference trainers;
  *   - training stops early when the best pair's count drops below 2 — a
  *     pair seen once is noise, and every published trainer has an
  *     equivalent min-frequency floor.
  */
object BpeTrain {

  /** Top-`vocabCap` whitespace-delimited words of `textCol` with exact
    * occurrence counts. The split is the apply-side pre-tokenizer contract
    * (`BpeCount.isWs`: ASCII space/\t\n\v\f\r): those bytes only occur as
    * their own chars in UTF-8, so a char-class split equals the byte-level
    * split. */
  def wordCounts(docs: DataFrame, textCol: String, vocabCap: Int): DataFrame =
    docs
      .select(explode(split(col(textCol), "[ \\t\\n\\u000B\\f\\r]+")).as("word"))
      .where(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").cast("binary").asc)
      .limit(vocabCap)

  /** Learn `numMerges` byte-level BPE merges from the corpus. Returned
    * pairs are BYTE tokens (latin-1 strings, one char per raw byte) in
    * rank order — feed them to [[trainedRanks]] /
    * [[org.apache.spark.sql.graft.BpeRanks.fromByteTokens]], NOT the
    * UTF-8 `BpeRanks.apply` path. */
  def trainBpe(docs: DataFrame, textCol: String, numMerges: Int,
               vocabCap: Int = 65536): Seq[(String, String)] = {
    val dict: Array[(String, Long)] = wordCounts(docs, textCol, vocabCap)
      .collect().map(r => (BpeRanks.latin1(r.getString(0)), r.getLong(1)))
    trainOnDict(dict, numMerges)
  }

  /** Learn and compile in one step (the common caller shape:
    * `bpe_count(col, trainedRanks(...))`). */
  def trainedRanks(docs: DataFrame, textCol: String, numMerges: Int,
                   vocabCap: Int = 65536): BpeRanks =
    BpeRanks.fromByteTokens(trainBpe(docs, textCol, numMerges, vocabCap))

  /** The learned merge list as a (rank, left, right) DataFrame — the
    * serialization shape (a vocabulary is data; persist it like any other
    * table). */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("rank", "left", "right")
  }

  /** The driver-side merge loop over the capped (word, count) dict —
    * INCREMENTAL pair-count maintenance (the classic trainer
    * optimization): pair counts and a pair→words occurrence index are
    * built once, and each merge updates only the words that CONTAIN the
    * merged pair (subtract the word's old adjacent-pair bag, apply the
    * merge, add the new bag). Best-pair selection is a lazy-deletion
    * priority queue: every count change pushes a fresh entry; stale
    * entries (stored count ≠ current) pop and drop. Semantics are
    * bit-identical to the full-recount loop ([[trainOnDictNaive]],
    * kept as the spec's reference): same (count DESC, pair bytes ASC)
    * best-pair order, same overlap counting, same min-count-2 stop —
    * spec-pinned equivalent on randomized dicts and the hand fixtures.
    *
    * Cost: O(dict tokens) init, then O(affected words + log #pairs) per
    * merge — a production 32k–50k-merge vocab over a 65k-word dict is
    * minutes of driver time instead of the naive loop's
    * O(merges × dict) hours (measured on the MERGES axis in
    * docs/SCALE.md). Package-visible so the spec can pin it on
    * hand-computable fixtures. */
  private[graft] def trainOnDict(dict: Array[(String, Long)],
                                 numMerges: Int): Seq[(String, String)] = {
    type Pair = (String, String)
    val nW = dict.length
    val words = new Array[Array[String]](nW)
    val wcnt = new Array[Long](nW)
    var i = 0
    while (i < nW) {
      words(i) = dict(i)._1.toCharArray.map(String.valueOf(_))
      wcnt(i) = dict(i)._2
      i += 1
    }
    val cnt = new java.util.HashMap[Pair, java.lang.Long]()
    val occ = new java.util.HashMap[Pair, java.util.HashSet[Integer]]()
    // one word's adjacent-pair bag (with overlap multiplicity, matching
    // the naive scan: "aaa" counts (a,a) twice)
    def bag(toks: Array[String]): java.util.HashMap[Pair, java.lang.Long] = {
      val b = new java.util.HashMap[Pair, java.lang.Long]()
      var j = 0
      while (j < toks.length - 1) {
        b.merge((toks(j), toks(j + 1)), 1L, (x, y) => x + y)
        j += 1
      }
      b
    }
    case class Entry(count: Long, pair: Pair)
    val pq = new java.util.PriorityQueue[Entry](math.max(16, nW),
      (a: Entry, b: Entry) =>
        if (a.count != b.count) java.lang.Long.compare(b.count, a.count)
        else if (a.pair._1 != b.pair._1) a.pair._1.compareTo(b.pair._1)
        else a.pair._2.compareTo(b.pair._2))
    // init: global counts, occurrence index, one PQ entry per pair
    i = 0
    while (i < nW) {
      val it = bag(words(i)).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        cnt.merge(e.getKey, e.getValue.longValue() * wcnt(i), (x, y) => x + y)
        occ.computeIfAbsent(e.getKey, _ => new java.util.HashSet[Integer]())
          .add(i)
      }
      i += 1
    }
    cnt.forEach((p, c) => pq.add(Entry(c.longValue(), p)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[Pair]
    while (merges.size < numMerges) {
      // pop stale entries until the top reflects a current count
      var best: Pair = null
      var bestC = 0L
      var searching = true
      while (searching) {
        val e = pq.poll()
        if (e == null) searching = false
        else {
          val cur = cnt.get(e.pair)
          if (cur != null && cur.longValue() == e.count) {
            best = e.pair; bestC = e.count; searching = false
          } // else stale: drop and keep popping
        }
      }
      if (best == null || bestC < 2) return merges.toSeq
      merges += best
      val holders = occ.get(best)
      val changed = new java.util.HashSet[Pair]()
      if (holders != null) {
        val snapshot = holders.toArray(new Array[Integer](holders.size()))
        var s = 0
        while (s < snapshot.length) {
          val wi = snapshot(s).intValue()
          val oldBag = bag(words(wi))
          words(wi) = applyMerge(words(wi), best._1, best._2)
          val newBag = bag(words(wi))
          val itOld = oldBag.entrySet().iterator()
          while (itOld.hasNext) {
            val e = itOld.next()
            val p = e.getKey
            cnt.merge(p, -e.getValue.longValue() * wcnt(wi), (x, y) => x + y)
            changed.add(p)
            if (!newBag.containsKey(p)) {
              val set = occ.get(p)
              if (set != null) { set.remove(Integer.valueOf(wi))
                if (set.isEmpty) occ.remove(p) }
            }
          }
          // the old loop subtracted each old pair's FULL multiplicity, so
          // the new bag adds its full multiplicity back (not a delta)
          val itNew = newBag.entrySet().iterator()
          while (itNew.hasNext) {
            val e = itNew.next()
            val p = e.getKey
            cnt.merge(p, e.getValue.longValue() * wcnt(wi), (x, y) => x + y)
            changed.add(p)
            occ.computeIfAbsent(p, _ => new java.util.HashSet[Integer]())
              .add(wi)
          }
          s += 1
        }
      }
      // re-arm the queue with the changed pairs' CURRENT counts
      val itC = changed.iterator()
      while (itC.hasNext) {
        val p = itC.next()
        val c = cnt.get(p)
        if (c != null && c.longValue() <= 0L) { cnt.remove(p); occ.remove(p) }
        else if (c != null) pq.add(Entry(c.longValue(), p))
      }
    }
    merges.toSeq
  }

  /** The original full-recount merge loop — O(merges × dict tokens),
    * kept as the independent reference [[trainOnDict]] is spec-pinned
    * against (and as the readable statement of the semantics). */
  private[graft] def trainOnDictNaive(dict: Array[(String, Long)],
                                      numMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] = dict.map { case (w, c) =>
      (w.toCharArray.map(String.valueOf(_)), c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var iter = 0
    while (iter < numMerges) {
      val cnt = new java.util.HashMap[(String, String), java.lang.Long]()
      var wi = 0
      while (wi < words.length) {
        val (toks, c) = words(wi)
        var j = 0
        while (j < toks.length - 1) {
          cnt.merge((toks(j), toks(j + 1)), c, (x, y) => x + y)
          j += 1
        }
        wi += 1
      }
      var best: (String, String) = null
      var bestC = 0L
      val it = cnt.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey
        val c = e.getValue.longValue()
        if (c > bestC || (c == bestC && best != null && pairLt(p, best))) {
          best = p; bestC = c
        }
      }
      if (best == null || bestC < 2) return merges.toSeq
      merges += best
      words = words.map { case (toks, c) => (applyMerge(toks, best._1, best._2), c) }
      iter += 1
    }
    merges.toSeq
  }

  /** (left, right) pair order on latin-1 token strings = unsigned
    * byte-lexicographic on (left bytes, right bytes) — the same order
    * Python's bytes-tuple comparison produces. */
  private def pairLt(a: (String, String), b: (String, String)): Boolean = {
    val l = a._1.compareTo(b._1)
    l < 0 || (l == 0 && a._2.compareTo(b._2) < 0)
  }

  /** Merge ALL adjacent (a,b) occurrences left-to-right — the same pass
    * shape as the apply-side `BpeCount.mergeWord`. */
  private def applyMerge(toks: Array[String], a: String, b: String): Array[String] = {
    val out = new Array[String](toks.length)
    var w = 0
    var k = 0
    val n = toks.length
    while (k < n) {
      if (k < n - 1 && toks(k) == a && toks(k + 1) == b) {
        out(w) = a + b; w += 1; k += 2
      } else {
        out(w) = toks(k); w += 1; k += 1
      }
    }
    java.util.Arrays.copyOf(out, w)
  }
}
