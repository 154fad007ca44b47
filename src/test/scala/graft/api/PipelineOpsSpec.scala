package graft.api

import graft.TestSpark
import graft.core.SimHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Top-level (not nested in the suite) so the expression's decoder reference
  * serializes without dragging the test class into the task closure. */
object FixedTestDecoder extends org.apache.spark.sql.graft.MediaDecoder {
  def decode(bytes: Array[Byte]): (Long, Int, Int, Double) =
    (bytes.length.toLong * 100L, 2, 3, 0.5)
}

class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("simhash64: deterministic, near-texts have small hamming") {
    val a = SimHash.simhash64("the quick brown fox jumps over the lazy dog")
    val b = SimHash.simhash64("the quick brown fox jumps over the lazy cat")
    val c = SimHash.simhash64("completely different words entirely unrelated content here")
    assert(a == SimHash.simhash64("the quick brown fox jumps over the lazy dog"))
    assert(SimHash.hamming(a, b) < SimHash.hamming(a, c))
    assert(SimHash.simhash64("") == 0L)
  }

  test("simhash64 via SQL matches kernel") {
    val got = spark.sql("SELECT simhash64('hello world') AS h").collect().head.getLong(0)
    assert(got == SimHash.simhash64("hello world"))
    assert(spark.sql("SELECT hamming_dist(simhash64('x y z'), simhash64('x y z')) d")
      .collect().head.getInt(0) == 0)
  }

  test("fingerprints: equality and containment behavior") {
    val f1 = SimHash.minFingerprint("abcdefghij", 4)
    assert(f1 == SimHash.minFingerprint("abcdefghij", 4))
    assert(SimHash.minFingerprint("ab", 4) == 0L)
    val w1 = SimHash.winnow("the quick brown fox jumps over the lazy dog", 4, 4)
    assert(w1.nonEmpty && w1.toSeq == w1.sorted(Ordering.fromLessThan[Long](
      (a, b) => java.lang.Long.compareUnsigned(a, b) < 0)).toSeq)
    // identical text -> identical winnowed set
    assert(SimHash.winnow("the quick brown fox jumps over the lazy dog", 4, 4).toSeq == w1.toSeq)
  }

  test("winnow is robust to a prefix insertion (sliding windows, not tiles)") {
    val text = "the quick brown fox jumps over the lazy dog and then some more text " +
      "to make the fingerprint set comfortably larger than a couple of windows"
    val k = 4
    val w = 8
    val base = SimHash.winnow(text, k, w).toSet
    val shifted = SimHash.winnow("Z" + text, k, w).toSet
    // Every window not touching the edited prefix selects the same local
    // minimum, so the sets agree on all but O(1) elements — a tiled scan
    // (start += w) realigns every boundary and fails this immediately.
    val overlap = (base & shifted).size.toDouble / base.size
    assert(overlap >= 1.0 - 1.0 / w,
      s"prefix insertion kept only ${(overlap * 100).round}% of fingerprints")
    // fewer than w k-grams -> exactly one window over all of them
    assert(SimHash.winnow("abcde", 4, 8).length == 1)
  }

  test("Dedup.exact keeps smallest tiebreak per content group") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa")).toDF("id", "text")
    val out = Dedup.exact(df, Seq("text"), "id").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("Dedup.simhashDupPairs finds exact dup, skips unrelated") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten")).toDF("id", "text")
    val pairs = Dedup.simhashDupPairs(df, "id", "text", bands = 4, maxHamming = 3).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getInt(2) == 0))
    assert(!pairs.exists(r => r.getLong(1) == 3L))
  }

  test("Dedup.keepBestPerCluster keeps one best representative, singletons survive") {
    val docs = Seq((1L, "aa", 10L), (2L, "bb", 30L), (3L, "cc", 30L), (9L, "zz", 5L))
      .toDF("doc_id", "text", "n_chars")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("id", "cluster")
    val got = Dedup.keepBestPerCluster(docs, clusters, "doc_id",
        Seq(col("n_chars").desc, col("doc_id").asc))
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    // doc 2 wins the cluster (n_chars tie with 3, smaller id); 9 is a singleton
    assert(got == Seq(2L, 9L))
  }

  test("BandedLsh.nearDupPairs finds the planted near-dup") {
    val base = "spark native analytics engine with locality sensitive hashing support"
    val df = Seq((1L, base), (2L, base + " x"), (3L, "totally different content about nothing relevant"))
      .toDF("id", "text")
    val pairs = BandedLsh.nearDupPairs(df, "id", "text", 3, 8, 2, 42L, 0.5).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L))
  }

  test("BandedLsh.dupClusters labels connected components to min id") {
    val pairs = Seq((1L, 2L, 0.9), (2L, 5L, 0.9), (7L, 8L, 0.9)).toDF("id_a", "id_b", "sim")
    val want = Seq((1L, 1L), (2L, 1L), (5L, 1L), (7L, 7L), (8L, 7L))
    val uf = BandedLsh.dupClusters(pairs)
    val viaUnionFind = uf.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaUnionFind == want)
    // force the distributed hash-min path and require identical labels
    val dist = BandedLsh.dupClusters(pairs, driverThreshold = 0L)
    val viaDistributed = dist.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaDistributed == want)
    // path taken is provable from the plan: the driver union-find returns a
    // LocalRelation; the distributed branch's result is a checkpointed RDD
    // scan — this is what makes dedup_clusters_distributed's green driver
    // row evidence that the SCALE branch (not the collect) produced it
    assert(uf.queryExecution.optimizedPlan.collectLeaves()
      .forall(_.getClass.getSimpleName.contains("LocalRelation")))
    assert(dist.queryExecution.optimizedPlan.collectLeaves()
      .exists(_.getClass.getSimpleName.contains("LogicalRDD")))
  }

  test("dupClusters distributed path: min propagates along edges, not just pointers") {
    // edges (1,3),(2,3): node 2's only path to the component min 1 runs
    // THROUGH node 3 — pointer-jumping the initial labels alone leaves node 2
    // labeled 2 forever (its initial label is itself); true hash-min must
    // converge every node to 1
    val pairs = Seq((1L, 3L, 0.9), (2L, 3L, 0.9)).toDF("id_a", "id_b", "sim")
    val want = Seq((1L, 1L), (2L, 1L), (3L, 1L))
    val got = BandedLsh.dupClusters(pairs, driverThreshold = 0L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    // long chain: pointer-jump acceleration must still reach the min within
    // the default iteration budget
    val chain = (1L until 40L).map(i => (i, i + 1, 0.9)).toDF("id_a", "id_b", "sim")
    val gotChain = BandedLsh.dupClusters(chain, driverThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(gotChain.forall(_._2 == 1L), s"non-min labels: ${gotChain.filter(_._2 != 1L).mkString(",")}")
    // an exhausted iteration budget must fail loudly, never return wrong labels
    val ex = intercept[IllegalStateException] {
      BandedLsh.dupClusters(chain, maxIters = 1, driverThreshold = 0L).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("dupClusters round count: log-diameter convergence, boundary throws") {
    // a diameter-32 chain pins the ROUND COUNT window: pointer-jump doubling
    // needs ~log2(32)=5 propagation rounds plus the convergence-detection
    // round — strictly more than 2 (multi-iteration is really exercised)
    // and at most 8 (the acceleration really is logarithmic, not linear);
    // the minimal budget minus one must hit the non-convergence throw, so
    // both sides of the boundary run under this spec.
    val chain = (0L until 32L).map(i => (i, i + 1, 0.9)).toDF("id_a", "id_b", "sim")
    val minIters = (1 to 9).find { k =>
      try {
        BandedLsh.dupClusters(chain, maxIters = k, driverThreshold = 0L).collect(); true
      } catch { case _: IllegalStateException => false }
    }
    assert(minIters.isDefined, "no budget up to 9 converged a 33-node chain")
    assert(minIters.get > 2 && minIters.get <= 8,
      s"round count ${minIters.get} outside the log-diameter window (3..8)")
    val ex = intercept[IllegalStateException] {
      BandedLsh.dupClusters(chain, maxIters = minIters.get - 1, driverThreshold = 0L).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    val ok = BandedLsh.dupClusters(chain, maxIters = minIters.get, driverThreshold = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ok.length == 33 && ok.forall(_._2 == 0L))
  }

  test("bandJoinSkewSafe: adversarial mega-bucket spreads across tasks, rows unchanged") {
    // one hot bucket: 400 a-rows × 150 b-rows = 60k pairs on ONE reducer in
    // the plain join; plus cold buckets that must take the untouched path
    val a = ((0 until 400).map(i => (0, 42L, i.toLong)) ++
      (0 until 50).map(i => (1, i.toLong, 10000L + i))).toDF("band", "band_hash", "id_a")
    val b = ((0 until 150).map(j => (0, 42L, 20000L + j)) ++
      (0 until 50).map(j => (1, j.toLong, 30000L + j))).toDF("band", "band_hash", "id_b")
    // at the scale this operator exists for, neither side broadcasts — the
    // pathology lives in the SHUFFLE join (one key → one reducer); with the
    // toy fixture Spark would broadcast b and hide it
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = a.join(b, Seq("band", "band_hash"))
        .select("band", "band_hash", "id_a", "id_b")
      val safe = BandedLsh.bandJoinSkewSafe(a, b, col("id_a"),
          hotThreshold = 10000L, blocks = 16)
        .select("band", "band_hash", "id_a", "id_b")
      // exact same row set
      assert(safe.exceptAll(plain).isEmpty && plain.exceptAll(safe).isEmpty)
      // the plain join serializes the hot bucket: one partition holds all
      // 60k pairs; the skew-safe join must bound every task near
      // total/blocks
      def partSizes(df: org.apache.spark.sql.DataFrame): Seq[Int] =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq
      val hotPairs = 400 * 150
      assert(partSizes(plain).max >= hotPairs,
        "fixture must actually be adversarial for the plain join")
      val sizes = partSizes(safe)
      // the per-GROUP bound is exact — (m/blocks)·n ≈ 3.75k pairs per
      // (band, hash, blk) — but groups land on the suite's 4 reducers by
      // hash, so the demonstrable claim here is "the one 60k-pair reducer
      // becomes ALL reducers at ≤2x the perfect balance" (collision
      // variance shrinks with real partition counts; the per-group cap is
      // what holds at scale).
      val reducers = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val total = plain.count()
      assert(sizes.max <= 2 * total / reducers,
        s"skew-safe join left ${sizes.max} pairs on one task " +
          s"(want ≤ ${2 * total / reducers} = 2x balanced over $reducers reducers)")
      assert(sizes.count(_ > 1000) >= reducers,
        s"hot pairs should spread over all $reducers reducers, " +
          s"sizes: ${sizes.sorted.reverse.take(8)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("bandedSelfJoinPairs equals the SQL blocking join pair set") {
    val spark2 = spark
    graft.sql.LshFunctions.register(spark2)
    spark2.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .createOrReplaceTempView("customer_bsj")
    val sqlPairs = spark2.sql("""
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM customer_bsj a JOIN customer_bsj b
        ON element_at(lsh_min(a.c_name, 2, 1, 3, 1), 1) = element_at(lsh_min(b.c_name, 2, 1, 3, 1), 1)
      WHERE a.c_custkey < b.c_custkey AND lsh_jaccard(a.c_name, b.c_name, 2) > 0.8
      UNION
      SELECT a.c_custkey AS key_a, b.c_custkey AS key_b
      FROM customer_bsj a JOIN customer_bsj b
        ON element_at(lsh_min(a.c_name, 2, 1, 3, 2), 1) = element_at(lsh_min(b.c_name, 2, 1, 3, 2), 1)
      WHERE a.c_custkey < b.c_custkey AND lsh_jaccard(a.c_name, b.c_name, 2) > 0.8
    """).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fused = BandedLsh.bandedSelfJoinPairs(
      spark2.table("customer_bsj"), "c_custkey", "c_name",
      ngramWidth = 2, bandCount = 1, bandSize = 3, seeds = Seq(1L, 2L), threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fused == sqlPairs, s"fused=${fused.size} sql=${sqlPairs.size}")
    assert(fused.nonEmpty)
  }

  test("nearDupPairs (join path) equals the fused multi-band path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val join = BandedLsh.nearDupPairs(docs, "doc_id", "text", 4, 8, 3, 123L, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fused = BandedLsh.bandedSelfJoinPairs(docs, "doc_id", "text", 4, 8, 3, Seq(123L), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(fused == join, s"fused=${fused.size} join=${join.size}")
    assert(fused.nonEmpty)
  }

  test("nearDupPairsAdaptive: both routes produce the nearDupPairs set") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val base = BandedLsh.nearDupPairs(docs, "doc_id", "text", 4, 8, 3, 123L, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // generous budgets -> relational route; zero budgets -> fused route
    val rel = BandedLsh.nearDupPairsAdaptive(docs, "doc_id", "text", 4, 8, 3, 123L, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val fused = BandedLsh.nearDupPairsAdaptive(docs, "doc_id", "text", 4, 8, 3, 123L, 0.5,
        maxRelationalCandidates = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rel == base, s"relational route: adaptive=${rel.size} base=${base.size}")
    assert(fused == base, s"fused route: adaptive=${fused.size} base=${base.size}")
    assert(base.nonEmpty)
  }

  test("candidateCensus matches the materialized candidate-pair count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val (cand, maxBucket, rows) =
      BandedLsh.candidateCensus(docs, "doc_id", "text", 4, 8, 3, 123L)
    // ground truth from the banded rows themselves: Σ C(n,2) over buckets
    val counts = BandedLsh.bandedRows(docs, "doc_id", "text", 4, 8, 3, 123L)
      .groupBy("band", "band_hash").count().collect().map(_.getLong(2))
    assert(cand == counts.map(n => n * (n - 1) / 2).sum)
    assert(maxBucket == counts.max)
    assert(rows == counts.sum / 8) // 8 bands per surviving doc
  }

  test("approxJoinMllib: recall vs the custom path, sims agree off-boundary") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val custom = BandedLsh.nearDupPairs(docs, "doc_id", "text", 4, 8, 3, 123L, 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val mllib = BandedLsh.approxJoinMllib(docs, "doc_id", "text",
        ngramWidth = 4, numHashTables = 8, seed = 123L, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // recall over the custom path's solid pairs (sim comfortably above the
    // threshold — boundary pairs can legitimately flip on either side from
    // HashingTF term collisions): MLlib's 8 single-hash OR-tables admit a
    // true pair of sim s with p = 1-(1-s)^8 >= 0.94 at s = 0.3, so a 0.9
    // floor is conservative, not tuned to the fixture
    val solid = custom.filter(_._2 >= 0.35)
    assert(solid.nonEmpty, "fixture produced no pairs above 0.35 — vacuous test")
    val recalled = solid.keys.count(mllib.contains)
    assert(recalled.toDouble / solid.size >= 0.9,
      s"mllib recall ${recalled}/${solid.size} below 0.9 floor")
    // on shared pairs the two sims measure the same Jaccard (exact shingle
    // sets vs 2^18 hashed term space) and must agree tightly
    val shared = solid.keys.filter(mllib.contains)
    assert(shared.forall(k => math.abs(custom(k) - mllib(k)) < 0.05),
      "shared-pair sims diverge > 0.05: HashingTF space too collided")
    // contract shape: ordered ids, sims strictly above threshold
    assert(mllib.keys.forall { case (a, b) => a < b })
    assert(mllib.values.forall(_ > 0.3))
  }

  test("TextAnalysis langId and qualityScore") {
    val df = Seq(
      "the cat is in the house and it was big",
      "le chat est dans la maison et il est grand",
      "el gato es un animal y se fue en la casa",
      "zzz qqq www").toDF("text")
    val got = df.select(TextAnalysis.langId($"text")).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "fr", "es", "und"))
    val q = df.select(TextAnalysis.qualityScore($"text")).collect().map(_.getDouble(0))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("TextAnalysis repetitionStats flags degenerate repetition") {
    val df = Seq(
      (1L, "spam spam spam spam"),          // one word, one gram, repeated
      (2L, "all words here are different"), // no repetition at all
      (3L, "x")                             // no 2-grams: fracs must be 0.0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df).orderBy("doc_id").collect()
    val spam = got(0)
    assert(spam.getLong(1) == 4 && spam.getDouble(2) == 0.75)  // 1 - 1/4
    assert(spam.getDouble(3) == 1.0 && spam.getDouble(4) == 2.0 / 3.0)
    val clean = got(1)
    assert(clean.getDouble(2) == 0.0 && clean.getDouble(3) == 0.25 &&
      clean.getDouble(4) == 0.0)
    val short = got(2)
    assert(short.getLong(1) == 1 && short.getDouble(3) == 0.0 &&
      short.getDouble(4) == 0.0)
  }

  test("TextAnalysis tokenEntropy: uniform = log2(k), constant = 0, empty = 0") {
    val docs = Seq(
      (1L, "a b c d"),        // 4 distinct tokens -> 2 bits
      (2L, "x x x x"),        // single repeated token -> 0 bits
      (3L, ""),               // no tokens -> 0 bits, n 0
      (4L, "a a b b")         // two tokens at p=1/2 -> 1 bit
    ).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(math.abs(got(0)._2 - 2.0) < 1e-12 && got(0)._3 == 4)
    assert(got(1)._2 == 0.0 && got(1)._3 == 4)
    assert(got(2)._2 == 0.0 && got(2)._3 == 0)
    assert(math.abs(got(3)._2 - 1.0) < 1e-12)
  }

  test("TextAnalysis docLogProb: hand-computed cross-entropy, empty doc, tail ordering") {
    val docs = Seq(
      (1L, "the the cat"), // terms: cat(corpus 1)x1, the(corpus 3)x2
      (2L, "the dog"),
      (3L, "")             // no tokens -> 0, n 0
    ).toDF("doc_id", "text")
    val got = TextAnalysis.docLogProb(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    // corpus: the=3, cat=1, dog=1, total=5
    val ln5 = math.log(5.0); val ln3 = math.log(3.0)
    val want1 = (1.0 * ln5 + 2.0 * (ln5 - ln3)) / 3.0
    val want2 = ((ln5 - 0.0) + (ln5 - ln3)) / 2.0
    assert(math.abs(got(0)._2 - want1) < 1e-9 && got(0)._3 == 3)
    assert(math.abs(got(1)._2 - want2) < 1e-9 && got(1)._3 == 2)
    assert(got(2)._2 == 0.0 && got(2)._3 == 0)
    // the common-token doc must score lower nll than the rare-token doc
    assert(got(0)._2 < got(1)._2)
  }

  test("TextAnalysis docLogProbBigram: hand-computed transitions; sees word ORDER") {
    // corpus: two docs sharing one ordered phrase, one doc with the SAME
    // tokens shuffled. Unigram scores the shuffled doc identically to its
    // ordered twin; the bigram must penalize it.
    val phrase = "the quick brown fox jumps over the lazy dog"
    val shuffled = "dog the over fox lazy jumps quick the brown"
    val docs = Seq(
      (1L, phrase), (2L, phrase), (3L, shuffled), (4L, "x")) // 1 token → 0
      .toDF("doc_id", "text")
    val uni = TextAnalysis.docLogProb(docs).orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    val bi = TextAnalysis.docLogProbBigram(docs).orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    assert(uni(0)._1 == uni(2)._1, "unigram is order-blind by construction")
    assert(bi(0)._1 == bi(1)._1, "identical docs score identically")
    // margin sized to this tiny corpus: add-one smoothing over V=8 damps
    // the gap (measured 1.82 vs 1.43); the DIRECTION is the contract
    assert(bi(2)._1 > bi(0)._1 + 0.25,
      s"shuffled doc must score clearly worse: ${bi(2)._1} vs ${bi(0)._1}")
    assert(bi(3) == ((0.0, 0L)), "single-token doc has no transitions")
    // hand check on a tiny corpus: V=3, transitions a->b x2, b->a x1
    val tiny = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.docLogProbBigram(tiny).orderBy("doc_id").collect()
      .map(r => (r.getDouble(1), r.getLong(2)))
    // corpus bigrams: (a,b)=2, (b,a)=1; prev totals: a=2, b=1; V=2 distinct? a,b -> V=2
    // doc1: a->b: -ln(3/4)... p(b|a)=(2+1)/(2+2)=3/4; p(a|b)=(1+1)/(1+2)=2/3
    val w1 = (-math.log(3.0 / 4.0) + -math.log(2.0 / 3.0)) / 2.0
    val w2 = -math.log(3.0 / 4.0)
    assert(math.abs(got(0)._1 - w1) < 1e-9 && got(0)._2 == 2)
    assert(math.abs(got(1)._1 - w2) < 1e-9 && got(1)._2 == 1)
  }

  test("unicode_norm: NFC composes, NFD decomposes, NFKC folds, invalid form throws") {
    import org.apache.spark.sql.functions.col
    val nfdCafe = "cafe\u0301"     // e + combining acute (decomposed)
    val nfcCafe = "caf\u00e9"      // precomposed
    val lig = "\ufb01ne print"     // fi ligature U+FB01
    val df = Seq((1L, nfdCafe), (2L, nfcCafe), (3L, lig),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    def norm(form: String) = df.select(col("id"),
        graft.functions.unicode_norm(col("t"), form).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val nfc = norm("NFC")
    assert(nfc(1L) == nfcCafe && nfc(2L) == nfcCafe) // both spellings converge
    assert(nfc(3L) == lig)                           // NFC keeps compatibility chars
    assert(nfc(4L) == null)                          // NULL -> NULL
    val nfd = norm("NFD")
    assert(nfd(1L) == nfdCafe && nfd(2L) == nfdCafe)
    assert(norm("NFKC")(3L) == "fine print")         // ligature folds
    // idempotence: normalizing twice equals normalizing once
    val twice = df.select(graft.functions.unicode_norm(
        graft.functions.unicode_norm(col("t"), "NFC"), "NFC").as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(twice == df.select(graft.functions.unicode_norm(col("t"), "NFC"))
      .collect().map(_.getString(0)).toSeq)
    intercept[IllegalArgumentException] {
      graft.functions.unicode_norm(col("t"), "NFX")
    }
    // SQL registration (extensions path): default form NFC + explicit form
    val viaSql = spark.sql(
      "SELECT unicode_norm('cafe\\u0301'), unicode_norm('\\ufb01ne', 'NFKC')")
      .head()
    assert(viaSql.getString(0) == nfcCafe)
    assert(viaSql.getString(1) == "fine")
  }

  test("TextAnalysis normalizeText and redactPii") {
    val df = Seq("  Mixed \tCASEtext   with junk  ").toDF("text")
    val clean = df.select(TextAnalysis.normalizeText($"text")).head.getString(0)
    assert(clean == "mixed case text with junk")
    val pii = Seq("mail a.b+c@ex.co.uk or 10.1.2.3 call 555-123-4567 x 555-12-3456")
      .toDF("text")
    val red = pii.select(TextAnalysis.redactPii($"text")).head.getString(0)
    assert(red == "mail <EMAIL> or <IP> call <PHONE> x 555-12-3456")
  }

  test("TextAnalysis tfIdfTopK ranks rare terms above common ones") {
    val df = Seq(
      (1L, "alpha beta beta"),
      (2L, "alpha gamma"),
      (3L, "alpha delta")).toDF("doc_id", "text")
    val got = TextAnalysis.tfIdfTopK(df, "doc_id", "text", 2)
      .orderBy("doc_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(5)))
    // doc 1: beta tf=2 df=1 → 6.0 beats alpha tf=1 df=3 → 1.0
    assert(got.filter(_._1 == 1L).map(t => (t._3, t._4)).toSeq ==
      Seq(("beta", 6.0), ("alpha", 1.0)))
    // docs 2/3: their unique term (df=1, score 3.0) outranks alpha (1.0)
    assert(got.filter(_._1 == 2L).head._3 == "gamma")
    assert(got.filter(_._1 == 3L).head._3 == "delta")
  }

  test("TextAnalysis boilerplateStats flags documents dominated by common grams") {
    val common = "click here to subscribe"
    val docs = (0L until 8L).map(i => (i, common)) :+
      (8L, "genuinely original content nothing shared") :+
      (9L, s"$common but this one also has lots of fresh unique prose around it")
    val df = docs.toDF("doc_id", "text")
    val got = TextAnalysis.boilerplateStats(df, "doc_id", "text", 0.5, 0.5)
      .orderBy("doc_id").collect()
    // the 8 pure-boilerplate docs are dropped, the original doc survives
    assert(got.take(8).forall(_.getLong(4) == 0L))
    assert(got(8).getLong(4) == 1L && got(8).getDouble(3) == 0.0)
    // the mixed doc: 3 of 13 grams blacklisted → kept
    assert(got(9).getLong(4) == 1L && got(9).getLong(2) == 3L)
  }

  test("Ann.l2Normalize: unit norm, zero vector fixed point") {
    val df = Seq(
      (1L, Array(3.0, 4.0)),
      (2L, Array(0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Ann.l2Normalize(df).orderBy("vec_id", "pos").collect()
    assert(got(0).getDouble(2) == 5.0 && got(0).getDouble(3) == 0.6)
    assert(got(1).getDouble(3) == 0.8)
    assert(got(2).getDouble(2) == 0.0 && got(2).getDouble(3) == 0.0)
  }

  test("TextAnalysis chunkDocuments: overlap, short tail, empty docs dropped") {
    val df = Seq(
      (1L, "abcdefghij"),  // len 10, chunk 5 / overlap 2 → starts 0,3,6,9
      (2L, "abc"),         // single short chunk
      (3L, ""),            // dropped
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(df, "doc_id", "text", 5, 2)
      .orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1L, 0L, "abcde", 5L), (1L, 1L, "defgh", 5L),
      (1L, 2L, "ghij", 4L), (1L, 3L, "j", 1L),
      (2L, 0L, "abc", 3L)))
    // consecutive chunks overlap: what chunk i has past the step is chunk i+1's head
    got.sliding(2).foreach {
      case Array((d1, _, t1, _), (d2, _, t2, _)) if d1 == d2 =>
        assert(t1.drop(3) == t2.take(t1.length - 3))
      case _ =>
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkDocuments(df, "doc_id", "text", 5, 5)
    }
  }

  test("Ann.quantizeInt8: bounded codes, exact reconstruction bound, zero vec") {
    val df = Seq(
      (1L, Array(1.0, -2.0, 0.5)),
      (2L, Array(0.0, 0.0, 0.0)),   // all-zero: scale 0, codes 0
      (3L, Array(127.0))            // scale 1: exact representation
    ).toDF("vec_id", "embedding")
    val got = Ann.quantizeInt8(df).orderBy("vec_id", "pos").collect()
    val v1 = got.filter(_.getLong(0) == 1L)
    assert(v1.map(_.getLong(2)).toSeq == Seq(64, -127, 32)) // scale = 2/127
    assert(v1.forall(r => r.getDouble(4) <= r.getDouble(3) / 2 + 1e-15))
    val v2 = got.filter(_.getLong(0) == 2L)
    assert(v2.forall(r => r.getLong(2) == 0L && r.getDouble(4) == 0.0))
    val v3 = got.filter(_.getLong(0) == 3L)
    assert(v3.head.getLong(2) == 127L && v3.head.getDouble(4) == 0.0)
  }

  test("Packing two-level prefix sum equals the global window, any bucket count") {
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 200L).map(i => (i, (i * 7 % 13) + 1)).toDF("doc_id", "ntok")
    // sequential truth: one global window in (hashScore, id) order
    val w = Window.orderBy(Sampling.hashScore($"id", 21L).asc, $"id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val truth = df.select($"doc_id".as("id"), $"ntok".cast("long").as("tokens"))
      .withColumn("token_offset", coalesce(sum($"tokens").over(w), lit(0L)))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for (buckets <- Seq(1, 7, 64)) {
      val got = Packing.packSequences(df, "doc_id", $"ntok", seqLen = 16,
          seed = 21L, buckets = buckets)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.toSeq == truth.toSeq, s"buckets=$buckets diverged from global window")
    }
    // chunk ids: integer division of the verified offsets
    val chunks = Packing.packSequences(df, "doc_id", $"ntok", 16, 21L)
      .orderBy("id").collect()
    chunks.foreach { r =>
      assert(r.getLong(3) == r.getLong(2) / 16)
      assert(r.getLong(4) == (r.getLong(2) + r.getLong(1) - 1) / 16)
    }
    // zero-token rows occupy no space and are dropped
    val withEmpty = df.withColumn("ntok", when($"doc_id" === 5L, 0L).otherwise($"ntok"))
    assert(Packing.packSequences(withEmpty, "doc_id", $"ntok", 16, 21L)
      .filter($"id" === 5L).count() == 0)
  }

  test("globalRunningSum/assignRowIds equal the global window under ties, any bucket count") {
    import org.apache.spark.sql.expressions.Window
    // heavy ties: only 6 distinct order-key values over 200 rows, so
    // bucket boundaries land ON tied values and the dedup path runs;
    // buckets=128 >> distinct keys exercises collapsed boundaries
    val df = (0L until 200L).map(i => (i, i % 6, (i % 9) - 3)).toDF("doc_id", "k", "v")
    val w = Window.orderBy($"k".asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val truth = df.withColumn("run", coalesce(sum($"v").over(w), lit(0L)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    for (buckets <- Seq(1, 5, 128)) {
      val got = Packing.globalRunningSum(df, "doc_id", $"k", $"v", buckets)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(got.toSeq == truth.toSeq,
        s"buckets=$buckets diverged from the global window (negative values included)")
    }
    // assignRowIds = row_number over (ord, id), descending via negation
    val wantIds = df.orderBy($"k".desc, $"doc_id".asc).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => (id, i.toLong) }.toMap
    val gotIds = Packing.assignRowIds(df, "doc_id", -$"k", buckets = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotIds == wantIds)
    assert(gotIds.values.toSeq.sorted == (0L until 200L))
    // null ids and null keys have no place in the order: dropped
    val withNulls = df.unionByName(Seq((300L, null.asInstanceOf[java.lang.Long], 1L))
      .toDF("doc_id", "k", "v"))
      .unionByName(Seq((null.asInstanceOf[java.lang.Long], 1L, 1L))
        .toDF("doc_id", "k", "v"))
    assert(Packing.globalRunningSum(withNulls, "doc_id", $"k", $"v").count() == 200)
    // a null VALUE counts 0 and must NOT erase its bucket's total from
    // later offsets — plant the null on a row that is the LAST of its
    // bucket under buckets=5 (the max_by row, where a null would have
    // poisoned btotal before the coalesce)
    val nullVal = df.withColumn("v",
      when($"doc_id" === 199L, lit(null)).otherwise($"v"))
    val truthNull = nullVal.withColumn("run", coalesce(sum($"v").over(w), lit(0L)))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    for (buckets <- Seq(1, 5)) {
      val got = Packing.globalRunningSum(nullVal, "doc_id", $"k", $"v", buckets)
        .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(got.toSeq == truthNull.toSeq,
        s"buckets=$buckets: a null value poisoned its bucket total")
    }
    // duplicate (orderCol, id) rows — ids are NOT required unique. The
    // window breaks such ties arbitrarily, so WHICH tied copy gets which
    // prefix is free, but bucket totals are order-free sum(value), so the
    // multiset of (id, run) pairs must still equal the global window's
    // (a pick-the-last-row tie-break would corrupt every later bucket's
    // offset when the arbitrary pick isn't the true last)
    val dups = df.unionByName(df.filter($"doc_id" % 7 === 0)) // exact copies
    val truthDup = dups.withColumn("run", coalesce(sum($"v").over(w), lit(0L)))
      .collect().map(r => (r.getLong(0), r.getLong(3))).sorted
    for (buckets <- Seq(1, 5, 128)) {
      val got = Packing.globalRunningSum(dups, "doc_id", $"k", $"v", buckets)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
      assert(got.toSeq == truthDup.toSeq,
        s"buckets=$buckets: duplicate (orderCol, id) rows corrupted bucket totals")
    }
  }

  test("selectToTokenBudget keeps exactly the inclusive-cumsum-within-budget prefix") {
    // walk in doc_id order with token runs 10,20,30,... — budget 100
    // admits 10+20+30 (cum 60) and 40 (cum 100, EQUALITY kept); doc 5
    // (cum 150) overflows and, because the running total still counts it,
    // nothing after can sneak back in
    val df = (1L to 8L).map(i => (i, i * 10)).toDF("doc_id", "ntok")
    val got = Packing.selectToTokenBudget(df, "doc_id", $"doc_id", $"ntok",
        budget = 100L, buckets = 3)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 10L, 0L), (2L, 20L, 10L), (3L, 30L, 30L),
      (4L, 40L, 60L)))
    // budget 0: nothing fits
    assert(Packing.selectToTokenBudget(df, "doc_id", $"doc_id", $"ntok", 0L)
      .count() == 0)
  }

  test("corpusDiff: all four statuses; hash and body compare agree; null text handled") {
    val v1 = Seq((1L, "same"), (2L, "will change"), (3L, "goes away"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val v2 = Seq((1L, "same"), (2L, "did change"), (4L, "brand new"),
      (5L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val want = Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added", 5L -> "unchanged")
    for (byHash <- Seq(true, false)) {
      val got = Dedup.corpusDiff(v1, v2, byHash = byHash)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"byHash=$byHash: $got")
    }
  }

  test("repetitionFilter: each Gopher rule gates independently") {
    // thresholds chosen so each fixture doc trips exactly one rule
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // passes
      (2L, "too short here"),                                           // word count
      (3L, "dup alpha dup beta dup gamma dup delta dup epsilon"),       // dup words (non-adjacent: bigrams stay distinct)
      (4L, "ping pong ping pong ping pong alpha beta gamma delta epsilon zeta"), // bigram conc. (dwf 4/12 stays under cap)
      (5L, ("a1 b1 c1 d1 e1 f1 g1 h1 i1 j1 k1 l1 m1 n1 o1 p1 q1 r1" +
        " glue word glue word")) // dup bigrams: "glue word" x2 of 21 grams, top frac 0.095 and dwf 0.09 stay under caps
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionFilter(docs, minWords = 5L,
        maxDupWordFrac = 0.35, maxTop2GramFrac = 0.25, maxDup2GramFrac = 0.04)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false,
      5L -> false), got)
    // sanity that the intended rule (not a sibling) fired for 3 and 4
    val stats = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(stats(3L).getAs[Double]("dup_word_frac") > 0.35 &&
      stats(3L).getAs[Double]("top_2gram_frac") <= 0.25)
    assert(stats(4L).getAs[Double]("top_2gram_frac") > 0.25 &&
      stats(4L).getAs[Double]("dup_word_frac") <= 0.35)
    // doc 5 trips ONLY the dup-2gram cap — the rule the other fixtures
    // can't isolate (adjacent word dups inflate top-2gram too)
    assert(stats(5L).getAs[Double]("dup_2gram_frac") > 0.04 &&
      stats(5L).getAs[Double]("top_2gram_frac") <= 0.25 &&
      stats(5L).getAs[Double]("dup_word_frac") <= 0.35 &&
      stats(5L).getAs[Long]("word_count") >= 5L)
  }

  test("assignTokenShards: contiguous integer-exact boundaries, balanced mass, clamped tail") {
    val df = (0L until 500L).map(i => (i, (i * 13 % 29) + 1)).toDF("doc_id", "ntok")
    val shards = 8
    val got = Packing.assignTokenShards(df, "doc_id", $"doc_id", $"ntok",
        shards, buckets = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // sequential truth
    val seq0 = (0L until 500L).map(i => (i, (i * 13 % 29) + 1))
    val total = seq0.map(_._2).sum
    var run = 0L
    val want = seq0.map { case (id, t) =>
      val s = math.min(shards - 1, (run * shards / total).toInt)
      run += t; (id, t, s)
    }
    assert(got.toSeq == want)
    // contiguous in stream order and every shard present
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
    assert(got.map(_._3).distinct.length == shards)
    // token mass per shard within one max-doc of the ideal slice
    val perShard = got.groupBy(_._3).view.mapValues(_.map(_._2).sum)
    val ideal = total.toDouble / shards
    perShard.values.foreach(m => assert(math.abs(m - ideal) <= 29 + ideal * 0.05,
      s"shard mass $m too far from ideal $ideal"))
    // zero-token docs at the stream tail clamp into the last shard
    val withZero = df.unionByName(Seq((9999L, 0L)).toDF("doc_id", "ntok"))
    val z = Packing.assignTokenShards(withZero, "doc_id", $"doc_id", $"ntok",
      shards, buckets = 5).filter($"doc_id" === 9999L).head()
    assert(z.getInt(2) == shards - 1)
    // all-zero corpus: everything in shard 0, no division blowup
    val zeros = Packing.assignTokenShards(
      (0L until 10L).map((_, 0L)).toDF("doc_id", "ntok"),
      "doc_id", $"doc_id", $"ntok", shards).collect()
    assert(zeros.forall(_.getInt(2) == 0))
  }

  test("packDocsNextFit equals the sequential NFD walk; capacity + density hold") {
    // heavy-tailed lengths incl. TWO distinct oversize lengths (clamped
    // into one class — their exact length must not matter) and big
    // same-length classes
    val df = (0L until 300L).map { i =>
      val len = if (i % 37 == 0) 50L else if (i % 41 == 0) 40L
        else (i * 11 % 17) + 1L
      (i, len)
    }.toDF("doc_id", "ntok")
    val capacity = 32L
    val seed = 9L
    // stream order truth: scores from the engine's own hashScore, then a
    // literal item-by-item NFD walk in plain Scala over the documented
    // order (class = min(len, capacity+1) desc, score, id)
    val stream = df.select($"doc_id", $"ntok",
        Sampling.hashScore($"doc_id", seed).as("score"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy { case (id, len, score) => (-math.min(len, capacity + 1), score, id) }
    val truth = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    var bin = -1L
    var rem = 0L
    stream.foreach { case (id, len, _) =>
      if (len > rem) { bin += 1; rem = capacity } // close, open fresh
      truth(id) = (bin, capacity - rem) // (bin, within-bin token offset)
      rem -= len // oversize drives rem negative -> next item opens a new bin
      if (rem < 0) rem = 0
    }
    for (buckets <- Seq(1, 7, 64)) {
      val got = Packing.packDocsNextFit(df, "doc_id", $"ntok", capacity,
          seed, buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(got.length == 300)
      got.foreach { case (id, _, b, off) =>
        assert((b, off) == truth(id), s"doc $id: ($b, $off), truth ${truth(id)} (buckets=$buckets)")
      }
    }
    val packed = Packing.packDocsNextFit(df, "doc_id", $"ntok", capacity, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // capacity: every bin fits, except dedicated oversize single-doc bins
    val byBin = packed.groupBy(_._3)
    byBin.foreach { case (b, docs) =>
      val total = docs.map(_._2).sum
      assert(total <= capacity || docs.length == 1,
        s"bin $b overfull with ${docs.length} docs / $total tokens")
    }
    // density: bin ids are exactly 0..maxBin
    assert(byBin.keySet == (0L to byBin.keys.max).toSet)
    // zero/negative-token rows are dropped
    val withEmpty = df.withColumn("ntok", when($"doc_id" === 5L, 0L).otherwise($"ntok"))
    assert(Packing.packDocsNextFit(withEmpty, "doc_id", $"ntok", capacity, seed)
      .filter($"id" === 5L).count() == 0)
  }

  test("packDocsNextFit: randomized corpora match the sequential walk") {
    // 15 random corpora: random capacities, random length mixes incl.
    // oversize and length == capacity edges — every assignment must equal
    // the literal item-by-item NFD walk
    val rng = new scala.util.Random(61)
    for (trial <- 0 until 15) {
      val capacity = 8L + rng.nextInt(40)
      val n = 50 + rng.nextInt(150)
      val seed = rng.nextLong()
      val df = (0L until n.toLong).map { i =>
        val len = rng.nextInt(4) match {
          case 0 => 1L + rng.nextInt(capacity.toInt)        // general
          case 1 => capacity                                 // exact fit
          case 2 => capacity + 1L + rng.nextInt(20)          // oversize
          case _ => 1L + rng.nextInt(3)                      // short tail
        }
        (i, len)
      }.toDF("doc_id", "ntok")
      val stream = df.select($"doc_id", $"ntok",
          Sampling.hashScore($"doc_id", seed).as("score"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy { case (id, len, score) => (-math.min(len, capacity + 1), score, id) }
      val truth = scala.collection.mutable.Map.empty[Long, (Long, Long)]
      var bin = -1L
      var rem = 0L
      stream.foreach { case (id, len, _) =>
        if (len > rem) { bin += 1; rem = capacity }
        truth(id) = (bin, capacity - rem)
        rem = math.max(0L, rem - len)
      }
      val got = Packing.packDocsNextFit(df, "doc_id", $"ntok", capacity, seed,
          buckets = 1 + rng.nextInt(16))
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
      assert(got.length == n)
      got.foreach { case (id, b, off) =>
        assert((b, off) == truth(id), s"trial $trial cap=$capacity doc $id: ($b, $off) != ${truth(id)}")
      }
    }
  }

  test("Ann cosine + brute-force top-k on a tiny corpus") {
    val vecs = Seq(
      (0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.9, 0.1, 0.0)),
      (2L, Array(0.0, 1.0, 0.0)), (3L, Array(-1.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val top = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), 2)
      .orderBy("rank").collect()
    assert(top.map(_.getLong(2)).toSeq == Seq(1L, 2L)) // nearest then orthogonal
    assert(top.head.getDouble(3) > 0.99)
  }

  test("ANN query-side size contract is enforced, not just documented") {
    val vecs = (0L until 20L).map(i =>
      (i, Array.tabulate(4)(d => math.sin(i * 1.0 + d)))).toDF("vec_id", "embedding")
    spark.conf.set("graft.ann.maxQueryRows", "5")
    try {
      // over the cap: fail fast at submit time with the conf name in the
      // message — NOT a driver OOM halfway through the collect
      val e = intercept[IllegalArgumentException] {
        Ann.bruteForceTopK(vecs, vecs, 3)
      }
      assert(e.getMessage.contains("graft.ann.maxQueryRows"))
      val e2 = intercept[IllegalArgumentException] {
        Ann.pqTopK(vecs, vecs, 3, m = 2, ksub = 4, seed = 7L)
      }
      assert(e2.getMessage.contains("graft.ann.maxQueryRows"))
      // at/below the cap: unaffected
      assert(Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" < 3), 2).count() > 0)
    } finally spark.conf.unset("graft.ann.maxQueryRows")
  }

  test("Ann.lshBucketedTopK returns a subset ranked identically") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.0 + d)))).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 2)
    val brute = Ann.bruteForceTopK(vecs, qs, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Ann.lshBucketedTopK(vecs, qs, 5, 2.0, 4, 2, 11L).collect()
    assert(lsh.nonEmpty)
    // every LSH result is a genuine vector pair with rank ordering intact
    lsh.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse)
    }
  }

  test("Ann.ivfTopK partitions the corpus and ranks within probed cells") {
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(6)(d => math.cos(i * 0.7 + d) * 3.0))).toDF("vec_id", "embedding")
    val got = Ann.ivfTopK(vecs, vecs.filter($"vec_id" < 2), k = 3,
      nlist = 4, nprobe = 2, seed = 99L).collect()
    assert(got.nonEmpty)
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 3)
      val sims = rows.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(sims == sims.sorted.reverse) // ranked descending
    }
    // determinism: same seed, same result
    val again = Ann.ivfTopK(vecs, vecs.filter($"vec_id" < 2), k = 3,
      nlist = 4, nprobe = 2, seed = 99L).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("Ann fit/search: one fitted index serves many batches, bit-equal to the one-shot path") {
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => math.cos(i * 0.7 + d) * 3.0))).toDF("vec_id", "embedding")
    val batch1 = vecs.filter($"vec_id" < 2)
    val batch2 = vecs.filter($"vec_id" >= 10 && $"vec_id" < 13)

    // IVF: fitted search == ivfTopK (which now delegates), on two batches
    val ivf = Ann.fitIvf(vecs, nlist = 4, seed = 99L)
    ivf.cells.persist()
    try {
      for (qs <- Seq(batch1, batch2)) {
        val fitted = ivf.search(qs, k = 3, nprobe = 2)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        val oneShot = Ann.ivfTopK(vecs, qs, k = 3, nlist = 4, nprobe = 2, seed = 99L)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        assert(fitted == oneShot)
        assert(fitted.nonEmpty)
      }
    } finally ivf.cells.unpersist()

    // IVF-PQ: same contract over the compressed index
    val ivfpq = Ann.fitIvfPq(vecs, nlist = 4, m = 4, ksub = 8, seed = 77L, iters = 4)
    ivfpq.encoded.persist()
    try {
      for (qs <- Seq(batch1, batch2)) {
        val fitted = ivfpq.search(qs, k = 3, nprobe = 2)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        val oneShot = Ann.ivfPqTopK(vecs, qs, k = 3, nlist = 4, nprobe = 2,
          m = 4, ksub = 8, seed = 77L, iters = 4)
          .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
        assert(fitted == oneShot)
        assert(fitted.nonEmpty)
      }
    } finally ivfpq.encoded.unpersist()
    // the compressed index really is cell+codes only — no raw vectors
    assert(ivfpq.encoded.columns.toSeq == Seq("neighbor_id", "cell", "codes"))
  }

  test("Ann saved IVF-PQ index: load round-trips models+codes, search bit-equal") {
    val vecs = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.3 + d) * 2.0))).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 4)
    val idx = Ann.fitIvfPq(vecs, nlist = 4, m = 4, ksub = 8, seed = 77L, iters = 4)
    Ann.saveIvfPqIndex(idx, "graft_spec_ivfpq_idx")
    try {
      val loaded = Ann.loadIvfPqIndex(spark, "graft_spec_ivfpq_idx")
      // models survive the table round trip exactly (bit-equal doubles)
      assert(loaded.centroids.map(_.toSeq).toSeq == idx.centroids.map(_.toSeq).toSeq)
      assert(loaded.books.map(_.map(_.toSeq).toSeq).toSeq ==
        idx.books.map(_.map(_.toSeq).toSeq).toSeq)
      val direct = idx.search(qs, k = 3, nprobe = 2)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      val fromDisk = loaded.search(qs, k = 3, nprobe = 2)
        .orderBy("query_id", "rank").collect().map(_.toSeq).toSeq
      assert(fromDisk == direct)
      assert(fromDisk.nonEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_spec_ivfpq_idx_codes")
      spark.sql("DROP TABLE IF EXISTS graft_spec_ivfpq_idx_model")
    }
  }

  test("Ann ivfPqIndexHealth: healthy after build, a drifted append trips the report") {
    val vecs = (0L until 80L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.3 + d) * 2.0))).toDF("vec_id", "embedding")
    val idx = Ann.fitIvfPq(vecs, nlist = 4, m = 4, ksub = 8, seed = 77L, iters = 4)
    Ann.saveIvfPqIndex(idx, "graft_spec_annhealth_idx")
    try {
      // freshly built: Lloyd's spread the corpus, no cell past 2x uniform
      assert(Ann.ivfPqIndexHealth(spark, "graft_spec_annhealth_idx",
        maxSkew = 2.0).isEmpty)
      // drifted append: 120 copies of vec 0 (one point mass) — its cell
      // balloons to >= 120/200*4 = 2.4x uniform while others shrink
      val drift = vecs.filter($"vec_id" === 0L)
        .crossJoin(spark.range(1, 121).select($"id".as("r")))
        .select(($"vec_id" + $"r" * 1000L).as("vec_id"), $"embedding")
      Ann.appendToIvfPqIndex(drift, "graft_spec_annhealth_idx")
      val report = Ann.ivfPqIndexHealth(spark, "graft_spec_annhealth_idx",
        maxSkew = 2.0).collect()
      assert(report.length == 1, s"expected exactly the ballooned cell, got ${report.toSeq}")
      assert(report(0).getLong(1) >= 120L) // cell_rows includes the appends
      assert(report(0).getDouble(2) > 2.0)
      // starved mode: the point-mass append collapsed every OTHER cell's
      // relative share (~80 rows over 3 cells of a 200-row index ≈ 0.5×) —
      // minSkew reports them as the complementary drift signal
      val starved = Ann.ivfPqIndexHealth(spark, "graft_spec_annhealth_idx",
        maxSkew = 2.0, minSkew = 0.8).collect()
      assert(starved.length == 4, s"ballooned + 3 starved cells: ${starved.toSeq}")
      assert(starved.count(_.getDouble(2) < 0.8) == 3)
      // the report names the cell the drift vector actually encodes to
      val driftCell = Ann.loadIvfPqIndex(spark, "graft_spec_annhealth_idx")
        .encoded.filter($"neighbor_id" === 1000L).select("cell").head().getInt(0)
      assert(report(0).getInt(0) == driftCell)
      // a wrong-dimension batch fails LOUD at append, not as silent
      // prefix-distance garbage in the index
      val badBatch = Seq((9999L, Array.tabulate(5)(_.toDouble)))
        .toDF("vec_id", "embedding")
      val e = intercept[Exception] {
        Ann.appendToIvfPqIndex(badBatch, "graft_spec_annhealth_idx")
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("trained at dimension")), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_spec_annhealth_idx_codes")
      spark.sql("DROP TABLE IF EXISTS graft_spec_annhealth_idx_model")
    }
  }

  test("Ann pre-bucketed corpus layout: same results, corpus pass skipped") {
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(6)(d => math.cos(i * 0.7 + d) * 3.0))).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 3)
    val direct = Ann.lshBucketedTopK(vecs, qs, k = 3,
      bucketWidth = 4.0, bandCount = 4, bandSize = 2, seed = 7L)
      .orderBy("query_id", "rank").collect()
    val bucketed = Ann.bucketCorpus(vecs, bucketWidth = 4.0, bandCount = 4,
      bandSize = 2, seed = 7L).cache()
    try {
      bucketed.count() // materialize the layout once
      val pre = Ann.lshBucketedTopKPrebucketed(bucketed, vecs, qs, k = 3,
        bucketWidth = 4.0, bandCount = 4, bandSize = 2, seed = 7L)
      assert(pre.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ==
        direct.map(_.toSeq).toSeq)
      // the second batch reads the materialized buckets instead of
      // re-exploding the corpus
      assert(pre.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))
    } finally bucketed.unpersist()
  }

  test("signature index: batch-vs-index pairs equal the self-join's cross pairs") {
    // incremental ingestion must find exactly the near-dup pairs the full
    // (corpus + batch) self-join finds between the two sides — same family,
    // same seed, same verify threshold
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter($"doc_id" < 35)
    val batch = docs.filter($"doc_id" >= 35)
    val full = BandedLsh.nearDupPairs(docs, "doc_id", "text", 4, 8, 3, 123L, 0.3)
      .filter(($"id_a" < 35) =!= ($"id_b" < 35))
      .select(greatest($"id_a", $"id_b").as("batch_id"),
        least($"id_a", $"id_b").as("corpus_id"), $"sim")
      .orderBy("batch_id", "corpus_id").collect()
    BandedLsh.saveSignatureIndex(corpus, "graft_test_sig_idx", 4,
      "doc_id", "text", 4, 8, 3, 123L)
    try {
      val inc = BandedLsh.nearDupAgainstIndex("graft_test_sig_idx", corpus, batch,
          "doc_id", "text", 4, 8, 3, 123L, 0.3)
        .orderBy("batch_id", "corpus_id").collect()
      assert(inc.nonEmpty, "fixture must contain at least one cross pair")
      assert(inc.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_sig_idx")
      spark.sql("DROP TABLE IF EXISTS graft_test_sig_idx_hot")
    }
  }

  test("nearDupPairsBySignature: identical texts estimate 1.0, no text columns move") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different content that shares nothing at all here")
    ).toDF("id", "text")
    val got = BandedLsh.nearDupPairsBySignature(df, "id", "text",
        4, 8, 3, 42L, k = 24, sigSeed = 7L, threshold = 0.5)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 1L && got.head.getLong(1) == 2L)
    assert(got.head.getDouble(2) == 1.0) // identical shingle sets -> identical signatures
    // the scale claim: no text attribute appears anywhere above the hashing
    // projection — candidates and verification run on (id, sig) only
    val plan = BandedLsh.nearDupPairsBySignature(df, "id", "text",
        4, 8, 3, 42L, k = 24, sigSeed = 7L, threshold = 0.5)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.nonEmpty &&
      joins.forall(_.output.forall(a => !a.name.contains("text"))),
      s"join output must carry no text columns:\n$plan")
  }

  test("nearDupJoin (A×B) equals the full self-join's cross-side pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = docs.filter($"doc_id" < 35)
    val b = docs.filter($"doc_id" >= 35)
    val full = BandedLsh.nearDupPairs(docs, "doc_id", "text", 4, 8, 3, 123L, 0.3)
      .filter(($"id_a" < 35) =!= ($"id_b" < 35))
      .select(least($"id_a", $"id_b").as("id_a"),
        greatest($"id_a", $"id_b").as("id_b"), $"sim")
      .orderBy("id_a", "id_b").collect()
    val cross = BandedLsh.nearDupJoin(a, b, "doc_id", "text", "doc_id", "text",
        4, 8, 3, 123L, 0.3)
      .orderBy("id_a", "id_b").collect()
    assert(cross.nonEmpty && cross.map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("rolling ingestion: admitted batch signatures append to the index correctly") {
    // the scaladoc's rolling-ingestion recipe: admit batch 1 against the
    // index, APPEND its band rows, then batch 2 must near-dup against
    // corpus AND batch-1 admits through the bucketed join — if the append
    // wrote misbucketed files, the zero-exchange join would silently miss
    // batch1-vs-batch2 pairs (worse than failing loudly)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val corpus = docs.filter($"doc_id" < 30)
    val batch1 = docs.filter($"doc_id" >= 30 && $"doc_id" < 40)
    val batch2 = docs.filter($"doc_id" >= 40 && $"doc_id" < 50)
    BandedLsh.saveSignatureIndex(corpus, "graft_test_roll_idx", 4,
      "doc_id", "text", 4, 8, 3, 123L)
    try {
      def admit(pool: org.apache.spark.sql.DataFrame,
                batch: org.apache.spark.sql.DataFrame) = {
        val dup = BandedLsh.nearDupAgainstIndex("graft_test_roll_idx", pool, batch,
          "doc_id", "text", 4, 8, 3, 123L, 0.3)
        batch.join(dup.select(col("batch_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      }
      // MATERIALIZE before mutating the index: adm1's plan reads the index
      // table, so the append below invalidates a mere .cache() and the
      // recompute would read its own appended signatures — batch-1 ids
      // colliding with themselves under a corpus-only lookup, which the
      // coverage guard now correctly refuses (the inner-join era silently
      // dropped those pairs instead). localCheckpoint pins the DATA and
      // severs the lineage, the same discipline admitBatch ships with.
      val adm1 = admit(corpus, batch1).localCheckpoint(true)
      // append the admitted rows' signatures (the scaladoc recipe — routes
      // hot-bucket rows to the sidecar so the probe invariant holds)
      BandedLsh.appendToSignatureIndex(adm1, "graft_test_roll_idx",
        "doc_id", "text", 4, 8, 3, 123L)
      val adm2 = admit(corpus.unionByName(adm1.select(corpus.columns.map(col): _*)), batch2)
      val got = (adm1.select("doc_id").collect() ++ adm2.select("doc_id").collect())
        .map(_.getLong(0)).toSet
      // sequential ground truth from the full exact pair graph
      val pairSet = BandedLsh.nearDupPairs(docs.filter($"doc_id" < 50),
          "doc_id", "text", 4, 8, 3, 123L, 0.3)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def dup(x: Long, admitted: Set[Long]) =
        admitted.exists(y => pairSet.contains((math.min(x, y), math.max(x, y))))
      // per batch, keeps are judged against the PRE-batch index only —
      // intra-batch pairs don't block admission (matching the operator)
      var admitted = (0L until 30L).toSet
      var want = Set.empty[Long]
      for (b <- Seq(30L until 40L, 40L until 50L)) {
        val keep = b.filterNot(x => dup(x, admitted)).toSet
        admitted ++= keep; want ++= keep
      }
      assert(got == want,
        s"admission mismatch: extra=${got -- want} missing=${want -- got}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_test_roll_idx")
      spark.sql("DROP TABLE IF EXISTS graft_test_roll_idx_hot")
    }
  }

  test("signature index splits mega-buckets to the hot sidecar; probe results unchanged") {
    // 120 identical corpus docs collapse every band into one degenerate
    // bucket — the shape that would put all m·n candidate pairs on one
    // reducer. With the cap, those rows go to <table>_hot at BUILD time and
    // the probe grid-blocks them; the pair set must equal the uncapped
    // (all-cold, legacy-layout) index's.
    val dupText = "the same boilerplate paragraph repeated across the corpus"
    val corpus = ((0L until 120L).map(i => (i, dupText)) ++
      (200L until 230L).map(i => (i, s"unique document body number $i with extra words")))
      .toDF("doc_id", "text")
    val batch = ((1000L until 1020L).map(i => (i, dupText)) ++
      Seq((1100L, "unique document body number 205 with extra words")))
      .toDF("doc_id", "text")
    BandedLsh.saveSignatureIndex(corpus, "graft_test_hot_idx", 4,
      "doc_id", "text", 4, 8, 3, 123L, hotBucketCap = 50L)
    BandedLsh.saveSignatureIndex(corpus, "graft_test_cold_idx", 4,
      "doc_id", "text", 4, 8, 3, 123L) // default cap: nothing hot
    try {
      val hotRows = spark.table("graft_test_hot_idx_hot")
      assert(hotRows.count() == 120 * 8,
        "all 8 bands of the 120 identical docs must live in the sidecar")
      assert(spark.table("graft_test_hot_idx").count() == 30 * 8)
      assert(spark.table("graft_test_cold_idx_hot").count() == 0)
      def probe(idx: String) =
        BandedLsh.nearDupAgainstIndex(idx, corpus, batch,
            "doc_id", "text", 4, 8, 3, 123L, 0.5, blocks = 4)
          .orderBy("batch_id", "corpus_id").collect().map(_.toSeq).toSeq
      val viaHot = probe("graft_test_hot_idx")
      // all 20x120 mega-bucket pairs present (hot path found everything) ...
      assert(viaHot.size >= 20 * 120,
        s"expected at least the 2400 mega-bucket pairs, got ${viaHot.size}")
      // ... and pair-for-pair equal to the uncapped legacy-layout index
      assert(viaHot == probe("graft_test_cold_idx"))
      // rolling append INTO a hot bucket: the routed append must land the
      // new doc's rows in the sidecar, where hot-branch probes see them — a
      // bare insertInto to the main table would make the doc invisible to
      // every hot-bucket probe (the probe anti-joins hot keys off the cold
      // path)
      val newDoc = Seq((2000L, dupText)).toDF("doc_id", "text")
      BandedLsh.appendToSignatureIndex(newDoc, "graft_test_hot_idx",
        "doc_id", "text", 4, 8, 3, 123L)
      assert(spark.table("graft_test_hot_idx_hot")
        .filter($"corpus_id" === 2000L).count() == 8,
        "appended hot-bucket rows must route to the sidecar")
      val probe2 = BandedLsh.nearDupAgainstIndex("graft_test_hot_idx",
          corpus.unionByName(newDoc),
          Seq((3000L, dupText)).toDF("doc_id", "text"),
          "doc_id", "text", 4, 8, 3, 123L, 0.5, blocks = 4)
        .collect()
      assert(probe2.exists(r => r.getLong(1) == 2000L),
        s"probe must find the appended hot-bucket doc, got ${probe2.map(_.getLong(1)).toSet}")
    } finally for (t <- Seq("graft_test_hot_idx", "graft_test_hot_idx_hot",
                            "graft_test_cold_idx", "graft_test_cold_idx_hot"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("compactSignatureIndex: exact removal from both stores, frozen classification, probe intact") {
    val dupText = "the same boilerplate paragraph repeated across the corpus"
    val corpus = ((0L until 120L).map(i => (i, dupText)) ++
      (200L until 230L).map(i => (i, s"unique document body number $i with extra words")))
      .toDF("doc_id", "text")
    val prefix = "graft_test_cmp_idx"
    BandedLsh.saveSignatureIndex(corpus, prefix, 4,
      "doc_id", "text", 4, 8, 3, 123L, hotBucketCap = 50L)
    try {
      // delete 100 of the 120 hot-bucket docs and 5 cold-store docs
      val deletedIds = ((0L until 100L) ++ (200L until 205L)).toSet
      val report = BandedLsh.compactSignatureIndex(spark, prefix,
          deletedIds.toSeq.toDF("doc_id")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(report == Map("main" -> 5 * 8L, "hot" -> 100 * 8L),
        s"report must count both stores' removed band rows, got $report")
      val mainIds = spark.table(prefix).select("corpus_id")
        .collect().map(_.getLong(0)).toSet
      val hotIds = spark.table(s"${prefix}_hot").select("corpus_id")
        .collect().map(_.getLong(0)).toSet
      assert(mainIds == (205L until 230L).toSet,
        "main store must hold exactly the surviving cold docs")
      // frozen classification: the bucket is now 20 rows — far below the
      // cap — yet its survivors stay in the sidecar until a rebuild
      assert(hotIds == (100L until 120L).toSet,
        "hot store must hold exactly the surviving hot-bucket docs")
      // probe over the compacted index = the surviving corpus's answer
      val surviving = corpus.filter(!$"doc_id".isInCollection(deletedIds))
      val got = BandedLsh.nearDupAgainstIndex(prefix, surviving,
          Seq((3000L, dupText)).toDF("doc_id", "text"),
          "doc_id", "text", 4, 8, 3, 123L, 0.5, blocks = 4)
        .select("corpus_id").collect().map(_.getLong(0)).toSet
      assert(got == (100L until 120L).toSet,
        s"probe must find all surviving near-dups and no deleted id, got $got")
      // append into the still-classified (below-cap) hot bucket routes hot
      BandedLsh.appendToSignatureIndex(Seq((2000L, dupText)).toDF("doc_id", "text"),
        prefix, "doc_id", "text", 4, 8, 3, 123L)
      assert(spark.table(s"${prefix}_hot")
        .filter($"corpus_id" === 2000L).count() == 8,
        "partially-deleted hot buckets keep routing appends to the sidecar")
      // no-op deletion: empty report, nothing rewritten
      val before = spark.table(prefix).collect().map(_.toSeq).toSet
      assert(BandedLsh.compactSignatureIndex(spark, prefix,
        Seq(987654321L).toDF("doc_id")).isEmpty)
      assert(spark.table(prefix).collect().map(_.toSeq).toSet == before)
      // deleting EVERY remaining hot row de-classifies the bucket (the key
      // set lives in the sidecar): the next append routes cold — safe,
      // classification is probe routing, and both paths read the same keys
      BandedLsh.compactSignatureIndex(spark, prefix,
        ((100L until 120L) :+ 2000L).toDF("doc_id"))
      assert(spark.table(s"${prefix}_hot").count() == 0)
      BandedLsh.appendToSignatureIndex(Seq((2001L, dupText)).toDF("doc_id", "text"),
        prefix, "doc_id", "text", 4, 8, 3, 123L)
      assert(spark.table(prefix).filter($"corpus_id" === 2001L).count() == 8,
        "an emptied hot bucket's appends must land in the main store")
    } finally for (t <- Seq(prefix, s"${prefix}_hot"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("compactSignatureIndex refuses leftover scratches from an interrupted run") {
    val prefix = "graft_test_cmp2_idx"
    val corpus = (0L until 20L)
      .map(i => (i, s"unique document body number $i with extra words"))
      .toDF("doc_id", "text")
    BandedLsh.saveSignatureIndex(corpus, prefix, 4,
      "doc_id", "text", 4, 8, 3, 123L)
    try {
      for (scr <- Seq(s"${prefix}_compact_tmp", s"${prefix}_hot_compact_tmp")) {
        Seq((1L, 0, 0L)).toDF("corpus_id", "band", "band_hash")
          .write.format("parquet").mode("overwrite").saveAsTable(scr)
        val e = intercept[IllegalArgumentException] {
          BandedLsh.compactSignatureIndex(spark, prefix,
            Seq(0L).toDF("doc_id"))
        }
        assert(e.getMessage.contains("interrupted"), e.getMessage)
        spark.sql(s"DROP TABLE `$scr`")
      }
      // both refusals left the index intact
      assert(spark.table(prefix).count() == 20 * 8)
    } finally for (t <- Seq(prefix, s"${prefix}_hot"))
      spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("Ann.cosineLshPairs: sign-LSH blocking finds near-parallel vectors, verifies exactly") {
    // identical direction -> identical sketch -> candidate in every chunk;
    // near-parallel (tiny perturbation) -> sketch within a few bits ->
    // pigeonhole chunk match; unrelated directions drop at verification or
    // never collide. Every emitted pair must genuinely pass the threshold
    // (blocking can lose pairs, never invent them).
    val base = Array.tabulate(16)(i => math.sin(i * 0.9) + 1.5)
    val near = base.zipWithIndex.map { case (v, i) => v + (if (i == 0) 1e-6 else 0.0) }
    val anti = base.map(-_)
    val vecs = Seq(
      (1L, base), (2L, base.map(_ * 2.0)), // same direction, sim = 1
      (3L, near),                          // near-parallel
      (4L, anti),                          // opposite: sim = -1, never passes
      // zero vectors sketch to all-ones bits and would collide with each
      // other, but their cosine is undefined (ANSI Spark: DIVIDE_BY_ZERO
      // throw) — the operator must exclude them up front, not crash
      (5L, Array.fill(16)(0.0)), (6L, Array.fill(16)(0.0))
    ).toDF("vec_id", "embedding")
    val rows = Ann.cosineLshPairs(vecs, nbits = 64, bands = 8, seed = 41L, threshold = 0.9)
      .orderBy("id_a", "id_b").collect()
    val got = rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      s"got ${got.mkString(",")}")
    assert(got.forall(_._3 > 0.9))
    // scaled copy is exactly parallel; allow the last-ulp wiggle of
    // fl(S / fl(sqrt(S))^2) rather than pinning a knife-edge 1.0
    assert(got.head._3 > 0.9999999)
    // determinism: same seed, same sketches, same pairs
    val again = Ann.cosineLshPairs(vecs, 64, 8, 41L, 0.9)
      .orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    assert(again == rows.map(_.toSeq).toSeq)
  }

  test("Ann bucketed-table index serves identical results to the direct path") {
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(6)(d => math.cos(i * 0.7 + d) * 3.0))).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 3)
    val direct = Ann.lshBucketedTopK(vecs, qs, k = 3,
      bucketWidth = 4.0, bandCount = 4, bandSize = 2, seed = 7L)
      .orderBy("query_id", "rank").collect()
    Ann.saveBucketedCorpus(vecs, "graft_test_bucket_idx", 4,
      bucketWidth = 4.0, bandCount = 4, bandSize = 2, seed = 7L)
    try {
      val fromTable = Ann.lshBucketedTopKFromTable("graft_test_bucket_idx",
        vecs, qs, k = 3, bucketWidth = 4.0, bandCount = 4, bandSize = 2, seed = 7L)
      assert(fromTable.orderBy("query_id", "rank").collect().map(_.toSeq).toSeq ==
        direct.map(_.toSeq).toSeq)
    } finally spark.sql("DROP TABLE IF EXISTS graft_test_bucket_idx")
  }

  test("Ann.pqTopK: ADC ranking is deterministic and layout-invariant") {
    val vecs = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(d => math.sin(i * 1.3 + d) * 2.0))).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 2)
    val a = Ann.pqTopK(vecs, qs, k = 3, m = 4, ksub = 8, seed = 5L)
      .orderBy("query_id", "rank").collect()
    assert(a.length == 6) // k rows per query
    assert(a.forall(_.getDouble(3) >= 0.0)) // squared distances
    // per query, adist ascends with rank (id tiebreak)
    a.groupBy(_.getLong(0)).values.foreach { rs =>
      val sorted = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(sorted.sameElements(sorted.sorted))
    }
    // bit-identical under corpus repartitioning: the hash sample, codebooks,
    // codes and ADC sums are all layout-invariant
    val b = Ann.pqTopK(vecs.repartition(7), qs, k = 3, m = 4, ksub = 8, seed = 5L)
      .orderBy("query_id", "rank").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("Ann.ivfPqTopK: probed-cell candidates ranked by ADC, layout-invariant") {
    val vecs = (0L until 60L).map(i =>
      (i, Array.tabulate(8)(d => math.cos(i * 0.9 + d) * 3.0))).toDF("vec_id", "embedding")
    val qs = vecs.filter($"vec_id" < 2)
    val a = Ann.ivfPqTopK(vecs, qs, k = 3, nlist = 4, nprobe = 2,
        m = 4, ksub = 8, seed = 11L)
      .orderBy("query_id", "rank").collect()
    assert(a.nonEmpty && a.forall(_.getDouble(3) >= 0.0))
    // candidates must come from probed cells only: results are a subset of
    // the unpruned PQ ranking's candidate pool, so every (q, n) pair must
    // also appear somewhere in full-corpus ADC order — spot-check via count
    assert(a.length <= 6)
    val b = Ann.ivfPqTopK(vecs.repartition(7), qs, k = 3, nlist = 4, nprobe = 2,
        m = 4, ksub = 8, seed = 11L)
      .orderBy("query_id", "rank").collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("ann_recall floor: every gated index family holds recall@10 >= 0.9") {
    // the stated quality bar behind the pinned ann_recall oracle row: the
    // VALUES pin catches any drift bit-exactly, this floor says how much
    // quality the gated configs are required to deliver on the fixture
    val out = graft.SparkEntry.queries("ann_recall")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(out.map(_.getString(0)).toSeq == Seq("ivf", "ivfpq_rerank", "lsh"))
    for (r <- out)
      assert(r.getDouble(3) >= 0.9,
        s"${r.getString(0)} recall ${r.getDouble(3)} below the 0.9 floor")
  }

  test("Ann quantizer training is invariant under corpus repartitioning") {
    // the sample is keyed on xxhash64(id, seed), never scan order: a layout
    // change (repartition, sorted input) must not move a single centroid
    val vecs = (0L until 80L).map(i =>
      (i, Array.tabulate(6)(d => math.sin(i * 1.3 + d) * 2.0))).toDF("vec_id", "embedding")
    val base = Ann.trainQuantizer(vecs, nlist = 4, seed = 99L, iters = 5,
      sampleSize = 32, idCol = "vec_id", vecCol = "embedding")
    val shuffled = Ann.trainQuantizer(vecs.repartition(7), nlist = 4, seed = 99L, iters = 5,
      sampleSize = 32, idCol = "vec_id", vecCol = "embedding")
    val sorted = Ann.trainQuantizer(vecs.orderBy($"vec_id".desc), nlist = 4, seed = 99L,
      iters = 5, sampleSize = 32, idCol = "vec_id", vecCol = "embedding")
    assert(base.map(_.toSeq).toSeq == shuffled.map(_.toSeq).toSeq)
    assert(base.map(_.toSeq).toSeq == sorted.map(_.toSeq).toSeq)
  }

  test("curateMultimodal: stage order, global caption dedup, greedy drop") {
    import org.apache.spark.sql.functions.{col, lit, when, concat}
    // twin fixtures at n=6: images 0-5 + near twins 100/103 + exact
    // twins 200/205; audio the same +1000. Junk captions land on
    // %7==2 ids (2, 100, 205, 1003); 5 and 1005 share a caption
    val imgs = Multimodal.syntheticPngTwins(spark, 6)
      .withColumn("kind", lit("image"))
    val wavs = Multimodal.syntheticWavTwins(spark, 6)
      .withColumn("media_id", col("media_id") + 1000L)
      .withColumn("kind", lit("audio"))
    val cap = when(col("media_id") % 7 === 2, lit("thumb img"))
      .when(col("media_id") % 1000 === 5, lit("a caption shared across the two modalities"))
      .otherwise(concat(lit("unique descriptive caption for media row "),
        col("media_id").cast("string")))
    val out = Multimodal.curateMultimodal(
        imgs.unionByName(wavs).withColumn("caption", cap))
      .select("media_id").collect().map(_.getLong(0)).toSet
    // caption rule: the %7==2 ids (images 2, 100, 205; audio 1003) die
    // on the 2-token caption
    assert(!out.contains(2L) && !out.contains(100L) && !out.contains(1003L))
    // global caption dedup: image 5 (min id) wins over audio 1005
    assert(out.contains(5L) && !out.contains(1005L))
    // perceptual greedy drop, per modality. Image near twin 100 died at
    // the CAPTION stage (100 % 7 == 2), so the twin that actually pins
    // the image perceptual stage is 103 (unique caption, reaches stage 3,
    // loses to original 3); exact twin 200 pins the hamming-0 path.
    assert(out.contains(0L) && !out.contains(200L))
    assert(out.contains(3L) && !out.contains(103L),
      "near twin 103 must reach the perceptual stage and lose to 3")
    assert(out.contains(1000L) && !out.contains(1200L) && !out.contains(1100L))
    // a clean unique-caption original survives everything
    assert(out.contains(4L) && out.contains(1004L))
  }

  test("Multimodal extractFeatures + sampleFrames plumbing") {
    val media = Seq(
      (1L, "hello world media payload".getBytes("UTF-8"), "application/octet-stream"),
      (2L, Array.empty[Byte], "application/octet-stream"))
      .toDF("media_id", "bytes", "mime")
    val feats = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).getLong(1) == 25L) // size
    assert(feats(0).getInt(3) == (('h' << 8) | 'e')) // fake width from header bytes
    assert(feats(1).getLong(1) == 0L)
    val frames = Multimodal.sampleFrames(media.filter($"media_id" === 1L), 1).collect()
    assert(frames.length == 2 && frames.head.getAs[Array[Byte]](2).length == 16)
    // determinism: same input, same checksum
    val again = Multimodal.extractFeatures(media).orderBy("media_id").collect()
    assert(feats(0).getLong(2) == again(0).getLong(2))
  }

  test("Multimodal decoder seam: a custom decoder drops in, schema unchanged") {
    // the pluggable-decoder contract: swapping the decoder object changes
    // only decoded VALUES — same schema, same plan shape, no operator edits
    val media = Seq((1L, "abcd".getBytes("UTF-8")), (2L, Array.emptyByteArray))
      .toDF("media_id", "bytes")
    val out = Multimodal.extractFeatures(media, FixedTestDecoder)
      .orderBy("media_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(400L, 0L)) // checksum = len*100
    assert(out.forall(r => r.getInt(3) == 2 && r.getInt(4) == 3 && r.getDouble(5) == 0.5))
    assert(Multimodal.extractFeatures(media, FixedTestDecoder).schema ==
      Multimodal.extractFeatures(media).schema)
    val rs = Multimodal.resizeStub(media, 64, FixedTestDecoder)
      .orderBy("media_id").collect()
    assert(rs.forall(r => r.getInt(1) == 2 && r.getInt(2) == 3)) // decoder dims flow through
  }

  test("Multimodal ImageIoDecoder: real PNG decode matches the pixel recipe; bad bytes hit the sentinel") {
    // encode->decode roundtrip through the REAL codec: features computed
    // from the decoded raster must equal features computed from the pixel
    // recipe directly (PNG is lossless; no ICC profile is written)
    val media = Multimodal.syntheticPngs(spark, 4)
    val out = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect()
    for (r <- out) {
      val m = r.getLong(0).toInt
      val (w, h) = (16 + m % 9, 16 + m % 7)
      var chk = 0L; var sum = 0L
      for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
        val v = graft.core.FxHash.add(graft.core.FxHash.add(graft.core.FxHash.add(
          graft.core.FxHash.add(0L, m.toLong), x.toLong), y.toLong), c.toLong) & 0xffL
        chk = graft.core.FxHash.add(chk, v); sum += v
      }
      assert(r.getInt(3) == w && r.getInt(4) == h, s"dims for id $m")
      assert(r.getLong(2) == chk, s"pixel checksum for id $m")
      assert(r.getDouble(5) == sum.toDouble / (w.toLong * h * 3), s"mean for id $m")
    }
    // undecodable payloads: deterministic sentinel, no throw, no row loss
    val bad = Seq((9L, "not a png at all".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val badOut = Multimodal.extractFeatures(bad, Multimodal.ImageIoDecoder).collect()
    assert(badOut.length == 1 && badOut(0).getLong(2) == 0L &&
      badOut(0).getInt(3) == -1 && badOut(0).getInt(4) == -1 &&
      badOut(0).getDouble(5) == -1.0)
  }

  test("Multimodal perceptual hashing: pixel-defined identity, banded twin recovery, honest nulls") {
    import spark.implicits._
    val media = Multimodal.syntheticPngTwins(spark, 12)
    // hash identity is pixel-defined: re-encoded exact twins at distance
    // 0, corner-shift twins within the pigeonhole bound, distinct images
    // unpaired (or filtered by the Hamming verify)
    val pairs = Multimodal.imageNearDupPairs(media, "media_id", "bytes",
        bands = 4, maxHamming = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (m <- 0 until 12 by 5)
      assert(pairs.get((m.toLong, (200 + m).toLong)).contains(0),
        s"re-encoded twin of $m must be at distance 0")
    for (m <- 0 until 12 by 3) {
      val d = pairs.get((m.toLong, (100 + m).toLong))
      assert(d.isDefined && d.get <= 10,
        s"corner-shift twin of $m missing or too far: $d")
    }
    // dhash and ahash are different lenses over the same raster
    val hs = media.filter($"media_id" === 0L)
      .select(Multimodal.imageHash($"bytes", "dhash"),
        Multimodal.imageHash($"bytes", "ahash")).head
    assert(!hs.isNullAt(0) && !hs.isNullAt(1) && hs.getLong(0) != hs.getLong(1))
    // honest nulls: undecodable bytes and rasters narrower than the grid
    val tiny = {
      val img = new java.awt.image.BufferedImage(4, 4,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val nulls = Seq((1L, "junk bytes".getBytes("UTF-8")), (2L, tiny))
      .toDF("media_id", "bytes")
      .select(Multimodal.imageHash($"bytes").as("h")).collect()
    assert(nulls.forall(_.isNullAt(0)),
      "undecodable and under-grid payloads must hash to NULL, not a sentinel")
  }

  test("Multimodal audio fingerprinting: sample-defined identity, banded twin recovery, honest nulls") {
    import spark.implicits._
    val media = Multimodal.syntheticWavTwins(spark, 12)
    val pairs = Multimodal.audioNearDupPairs(media, "media_id", "bytes",
        bands = 4, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    for (m <- 0 until 12 by 5)
      assert(pairs.get((m.toLong, (200 + m).toLong)).contains(0),
        s"byte-identical twin of $m must be at distance 0")
    for (m <- 0 until 12 by 3) {
      val d = pairs.get((m.toLong, (100 + m).toLong))
      // first-segment damage touches at most E(0) and Z(0)/Z(1) —
      // fingerprint bits {0, 32, 33} — so the exact distance is <= 3
      assert(d.isDefined && d.get <= 3,
        s"first-segment twin of $m missing or too far: $d")
    }
    // uniform gain leaves every sign-of-delta comparison: doubling the
    // samples (no clipping: recipe values stay in 16 bits / 2) would need
    // re-encode machinery, so pin the cheap invariant instead — the
    // fingerprint is non-degenerate (both halves populated)
    val fp0 = media.filter($"media_id" === 0L)
      .select(graft.functions.audio_fp($"bytes")).head.getLong(0)
    assert((fp0 & 0xffffffffL) != 0 && (fp0 >>> 32) != 0,
      s"degenerate fingerprint: ${fp0.toHexString}")
    // honest nulls: undecodable bytes, and a clip shorter than the
    // 33-segment grid
    val shortWav = {
      val pcm = new Array[Byte](10 * 2)
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 10L)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val nulls = Seq((1L, "junk bytes".getBytes("UTF-8")), (2L, shortWav))
      .toDF("media_id", "bytes")
      .select(graft.functions.audio_fp($"bytes").as("h")).collect()
    assert(nulls.forall(_.isNullAt(0)),
      "undecodable and under-grid clips must fingerprint to NULL, not a sentinel")
  }

  test("image_resize: integer box-filter, pass-through under the cap, honest nulls") {
    import graft.functions.image_resize
    val media = Multimodal.syntheticPngs(spark, 6) // dims 16..24 x 16..22
    val r = media.select($"media_id", image_resize($"bytes", 8).as("r"))
      .select($"media_id", $"r.width", $"r.height", $"r.out_w", $"r.out_h",
        length($"r.pixels").as("n"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getInt(2),
        x.getInt(3), x.getInt(4), x.getInt(5)))
    r.foreach { case (_, w, h, ow, oh, n) =>
      assert(math.max(ow, oh) == 8, "long side must hit the cap")
      assert(ow <= w && oh <= h && n == ow * oh * 3)
      // aspect preserved under floor: short = floor(short * 8 / long)
      if (w >= h) assert(oh == h * 8 / w) else assert(ow == w * 8 / h)
    }
    // under-cap rasters pass through at their own size (identity pixels)
    val small = media.select($"media_id", image_resize($"bytes", 4096).as("r"))
      .select($"r.width", $"r.out_w", $"r.height", $"r.out_h").head
    assert(small.getInt(0) == small.getInt(1) && small.getInt(2) == small.getInt(3))
    // honest nulls on junk
    val junk = Seq((1L, "junk".getBytes("UTF-8"))).toDF("media_id", "bytes")
      .select(image_resize($"bytes", 8).as("r")).head
    assert(junk.isNullAt(0))
  }

  test("dedupParagraphs: global keep-first by (doc_id, pos); empties and first occurrences survive") {
    val docs = Seq(
      (1L, "alpha\n\nshared one\n\nbeta"),
      (2L, "shared one\n\ngamma\n\n\n\ndelta"), // dup para + a true empty para
      (3L, "shared one\n\ngamma"),              // every paragraph already seen
      (4L, "echo\n\necho")                      // within-doc repeat
    ).toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(docs, "doc_id", "text")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "alpha\n\nshared one\n\nbeta",
      "first occurrences must be untouched")
    assert(got(2L) == "gamma\n\n\n\ndelta",
      "the duplicated paragraph is cut, the empty structural one survives")
    assert(got(3L) == "", "a doc made entirely of seen paragraphs empties")
    assert(got(4L) == "echo", "within-doc repeats cut too (global rule)")
  }

  test("dedupParagraphs: bad string id raises lazily at action time; clean string ids work") {
    // clean numeric-string ids: same verdicts as the long-id corpus,
    // and the validation must not run an eager job at CALL time — the
    // call itself returns a plan even when a bad id is present
    val clean = Seq(("1", "alpha\n\nshared"), ("2", "shared\n\nbeta"))
      .toDF("doc_id", "text")
    val got = Dedup.dedupParagraphs(clean, "doc_id", "text")
      .select("doc_id", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("1") == "alpha\n\nshared" && got("2") == "beta")
    val bad = Seq(("1", "alpha"), ("oops", "beta")).toDF("doc_id", "text")
    val lazyPlan = Dedup.dedupParagraphs(bad, "doc_id", "text") // no job yet
    val e = intercept[Exception] { lazyPlan.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("nulls under the long cast")),
      s"want the loud id-contract error, got: $e")
  }

  test("filterNoindex: a pre-existing __robots input column survives untouched") {
    // the scratch column the filter adds internally must not clobber
    // caller data of the same (or case-folded) name — ADVICE round 19
    val docs = Seq(
      (1L, "<html><head><meta name=\"robots\" content=\"noindex\"></head></html>", "keepme"),
      (2L, "<html><body>plain</body></html>", "metoo")
    ).toDF("doc_id", "html", "__ROBOTS")
    val out = TextAnalysis.filterNoindex(docs, "html").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L), "noindex page must drop")
    assert(out.head.getString(2) == "metoo",
      "the caller's __ROBOTS column must survive with its data")
    assert(out.head.schema.fieldNames.count(_.equalsIgnoreCase("__robots")) == 1,
      "no scratch column may leak into the output")
  }

  test("scriptProfile: per-class counts, dominant with fixed tie-break, none on scriptless docs") {
    val docs = Seq(
      (1L, "hello мир"),          // latin 5, cyrillic 3 -> latin
      (2L, "中文 test 中文中文"),   // cjk 6 > latin 4 -> cjk
      (3L, "мир mir"),            // 3 vs 3 tie -> latin (fixed order)
      (4L, "1234 .,!"),           // nothing -> none
      (5L, "مرحبا")               // arabic only
    ).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs, "text")
      .select("doc_id", "latin_chars", "cyrillic_chars", "cjk_chars",
        "arabic_chars", "dominant_script")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(got(1L) == ((5L, 3L, 0L, 0L, "latin")))
    assert(got(2L) == ((4L, 0L, 6L, 0L, "cjk")))
    assert(got(3L) == ((3L, 3L, 0L, 0L, "latin")))
    assert(got(4L) == ((0L, 0L, 0L, 0L, "none")))
    assert(got(5L) == ((0L, 0L, 0L, 5L, "arabic")))
  }

  test("corpusReport: per-slice totals and exact-dup excess") {
    val docs = Seq(
      ("a", "en", "x y"), ("a", "en", "x y"), ("a", "en", "z"),
      ("b", "de", "w")).toDF("source", "lang", "text")
    val got = TextAnalysis.corpusReport(docs, "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    assert(got(("a", "en")) == ((3L, 7L, 5L, 2L, 1L)))
    assert(got(("b", "de")) == ((1L, 1L, 1L, 1L, 0L)))
  }

  test("Multimodal WavDecoder: real PCM decode matches the sample recipe; bad/odd inputs hit the sentinel") {
    // encode->decode through javax.sound.sampled: PCM is lossless, so
    // features off the decoded stream must equal the recipe directly —
    // including the stereo interleave order (frame-major)
    val media = Multimodal.syntheticWavs(spark, 6)
    val out = Multimodal.extractFeatures(media, Multimodal.WavDecoder)
      .orderBy("media_id").collect()
    for (r <- out) {
      val m = r.getLong(0).toInt
      val (ch, frames) = (1 + m % 2, 400 + (m % 5) * 37)
      var chk = 0L; var tot = 0L
      for (k <- 0 until frames * ch) {
        val u = (graft.core.FxHash.add(graft.core.FxHash.add(0L, m.toLong),
          k.toLong) & 0xffffL).toInt
        chk = graft.core.FxHash.add(chk, u.toLong)
        tot += math.abs(if (u >= 0x8000) u - 0x10000 else u)
      }
      assert(r.getInt(3) == frames && r.getInt(4) == ch, s"layout for id $m")
      assert(r.getLong(2) == chk, s"sample checksum for id $m")
      assert(r.getDouble(5) == tot.toDouble / (frames * ch), s"mean_abs for id $m")
    }
    // garbage bytes and a non-PCM container must sentinel, not throw
    val bad = Seq((9L, "definitely not a riff".getBytes("UTF-8"))).toDF("media_id", "bytes")
    val badOut = Multimodal.extractFeatures(bad, Multimodal.WavDecoder).collect()
    assert(badOut.length == 1 && badOut(0).getLong(2) == 0L &&
      badOut(0).getInt(3) == -1 && badOut(0).getInt(4) == -1 &&
      badOut(0).getDouble(5) == -1.0)
    // a PNG through the WAV decoder (wrong modality) also sentinels
    val png = Multimodal.syntheticPngs(spark, 1)
    val cross = Multimodal.extractFeatures(png, Multimodal.WavDecoder).collect()
    assert(cross(0).getInt(3) == -1)
  }

  test("Multimodal ImageIoDecoder: JPEG decode is deterministic and near the recipe raster") {
    // the lossy second codec path: dims must survive exactly; the decoded
    // mean byte must sit within a tight band of the recipe mean (measured
    // < 0.5 at quality 0.95 — the gate's 2.0 tolerance has 4x headroom);
    // and decode must be bit-deterministic across runs (same checksums),
    // which is what lets the driver gate's boolean stay stable.
    val media = Multimodal.syntheticJpegs(spark, 8)
    def features() = Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
      .orderBy("media_id").collect()
    val out = features()
    val recipeMeans = media.select("media_id", "recipe_mean").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (r <- out) {
      val m = r.getLong(0).toInt
      assert(r.getInt(3) == 16 + m % 9 && r.getInt(4) == 16 + m % 7, s"dims for id $m")
      val err = math.abs(r.getDouble(5) - recipeMeans(m.toLong))
      assert(err < 2.0, s"mean err $err for id $m exceeds the gate tolerance")
    }
    assert(out.map(_.getLong(2)).toSeq == features().map(_.getLong(2)).toSeq,
      "JPEG decode must be deterministic run-to-run")
  }

  test("Multimodal resizeStub preserves aspect and caps the long side") {
    // stub header: width = b0<<8|b1, height = b2<<8|b3
    def payload(w: Int, h: Int, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      b(0) = (w >> 8).toByte; b(1) = w.toByte
      b(2) = (h >> 8).toByte; b(3) = h.toByte
      b
    }
    val media = Seq(
      (1L, payload(200, 100, 80)), // wide: out = (64, 32)
      (2L, payload(50, 200, 80)),  // tall: out = (16, 64)
      (3L, payload(40, 30, 80)))   // small: unchanged
      .toDF("media_id", "bytes")
    val rows = Multimodal.resizeStub(media, 64).orderBy("media_id").collect()
    assert(rows(0).getInt(3) == 64 && rows(0).getInt(4) == 32)
    assert(rows(1).getInt(3) == 16 && rows(1).getInt(4) == 64)
    assert(rows(2).getInt(3) == 40 && rows(2).getInt(4) == 30)
    // thumb = leading out_w bytes of the payload (stub resample)
    assert(rows(0).getAs[Array[Byte]](5).length == 64)
    assert(rows(2).getAs[Array[Byte]](5).length == 40)
  }

  test("SparkEnv.spread: widens a narrow scan, no-ops wide or shuffled inputs") {
    // narrow scan (1 split) widens to the session's shuffle parallelism
    val narrow = spark.range(0, 100, 1, 1).toDF("id")
    val widened = SparkEnv.spread(narrow)
    assert(widened.rdd.getNumPartitions == SparkEnv.shufflePartitions(spark))
    assert(widened.count() == 100)
    // a scan already at/above the parallelism floor: unchanged, same object
    val wide = spark.range(0, 100, 1, 8).toDF("id")
    assert(SparkEnv.spread(wide) eq wide)
    // an input with its own shuffle is NOT probed or repartitioned — the
    // exchange set the parallelism, and probing via .rdd under AQE would
    // run the upstream stages eagerly (twice)
    val shuffled = spark.range(0, 100, 1, 1).toDF("id")
      .groupBy(col("id") % 7).count()
    assert(SparkEnv.spread(shuffled) eq shuffled)
  }
  test("editVerifiedPairs: blocking candidates verified by normalized Levenshtein") {
    val rows = Seq(
      (1L, "Customer#000000001"),
      (2L, "Customer#000000002"),   // lev 1 vs ids 1 and 3 -> sim 17/18 ≈ .944
      (3L, "Customer#000000012"),   // lev 2 vs id 1        -> sim 16/18 ≈ .889
      (4L, "Supplier#999999999")    // far from everything
    ).toDF("id", "name")
    val got = BandedLsh.editVerifiedPairs(rows, "id", "name",
        ngramWidth = 2, bandCount = 8, bandSize = 2, seed = 7L, minSim = 0.9)
      .select("id_a", "id_b", "lev").as[(Long, Long, Long)].collect().toSet
    // only the single-edit pairs survive the 0.9 bar; nothing pairs with 4
    assert(got == Set((1L, 2L, 1L), (2L, 3L, 1L)))
    // relaxing the bar admits the two-edit pairs the blocking caught
    val loose = BandedLsh.editVerifiedPairs(rows, "id", "name",
        ngramWidth = 2, bandCount = 8, bandSize = 2, seed = 7L, minSim = 0.85)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(loose.contains((1L, 2L)) && loose.subsetOf(Set((1L, 2L), (1L, 3L), (2L, 3L))))
  }
  test("editVerifiedPairsAdaptive: a degenerate key cluster routes to the fused enumerator, same pairs") {
    // 60 near-identical keys (single trailing-digit edits of one template)
    // collide in essentially every band -> the largest bucket is ~60; with
    // maxRelationalBucket below that the census must route; plus a handful
    // of unrelated keys that must keep NOT pairing either way
    val hot = (0 until 60).map(i => (i.toLong, f"Customer#0000000$i%02d"))
    val cold = Seq((100L, "Supplier#999999999"), (101L, "Vendor#123456789"),
      (102L, "Account#555000111"))
    val rows = (hot ++ cold).toDF("id", "name")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val base = pairs(BandedLsh.editVerifiedPairs(rows, "id", "name",
      ngramWidth = 2, bandCount = 4, bandSize = 2, seed = 7L, minSim = 0.9))
    assert(base.nonEmpty, "fixture is vacuous: no edit-verified pairs")
    // generous bucket bound -> relational route
    val rel = pairs(BandedLsh.editVerifiedPairsAdaptive(rows, "id", "name",
      ngramWidth = 2, bandCount = 4, bandSize = 2, seed = 7L, minSim = 0.9))
    assert(rel == base, s"relational route: adaptive=${rel.size} base=${base.size}")
    // bound below the hot cluster -> fused route, identical pair set
    // (lev and edit_sim carried through bit-equal). Prove the route is
    // actually taken: the census must see the planted mega-bucket.
    val (_, maxBucket, _) = BandedLsh.candidateCensus(rows, "id", "name",
      ngramWidth = 2, bandCount = 4, bandSize = 2, seed = 7L)
    assert(maxBucket > 8L, s"fixture failed to plant a mega-bucket: $maxBucket")
    val fused = pairs(BandedLsh.editVerifiedPairsAdaptive(rows, "id", "name",
      ngramWidth = 2, bandCount = 4, bandSize = 2, seed = 7L, minSim = 0.9,
      maxRelationalBucket = 8L))
    assert(fused == base, s"fused route: adaptive=${fused.size} base=${base.size}")
    // non-integral ids fail LOUDLY at the entry point: the fused route
    // carries ids as longs, so a string UUID would cast to null and
    // silently drop pairs only when the hot-bucket route trips —
    // breaking the identical-pair-set contract nondeterministically
    val strIds = rows.select(concat(lit("u-"), col("id")).as("id"), col("name"))
    val e = intercept[IllegalArgumentException] {
      BandedLsh.editVerifiedPairsAdaptive(strIds, "id", "name",
        ngramWidth = 2, bandCount = 4, bandSize = 2, seed = 7L, minSim = 0.9)
    }
    assert(e.getMessage.contains("integral id column"), e.getMessage)
  }
  test("perplexityBuckets: ANSI ntile per lang, id tie-break, head/middle/tail") {
    val scored = Seq(
      // en: 7 docs, scores force order 10..70 -> tiles of 3/2/2
      (1L, "en", 10.0), (2L, "en", 20.0), (3L, "en", 30.0), (4L, "en", 40.0),
      (5L, "en", 50.0), (6L, "en", 60.0), (7L, "en", 70.0),
      // fr: tie on score -> doc_id breaks it
      (8L, "fr", 1.0), (9L, "fr", 1.0), (10L, "fr", 1.0)
    ).toDF("doc_id", "lang", "s")
    val got = TextAnalysis.perplexityBuckets(scored, "lang", "s")
      .select("doc_id", "ppl_bucket", "ppl_class")
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((1, "head")) && got(2L) == ((1, "head")) && got(3L) == ((1, "head")))
    assert(got(4L) == ((2, "middle")) && got(5L) == ((2, "middle")))
    assert(got(6L) == ((3, "tail")) && got(7L) == ((3, "tail")))
    assert(got(8L) == ((1, "head")) && got(9L) == ((2, "middle")) && got(10L) == ((3, "tail")))
  }
  test("perplexityBucketsSketch: bin cuts, degenerate lang, exact-tile agreement") {
    // uniform en scores at high bins resolution: cut bins land exactly on
    // the tile edges, so classes equal the exact operator's
    val en = (1L to 30L).map(i => (i, "en", i.toDouble))
    // de: all-equal scores -> single bin 0 -> everything head (pinned)
    val de = Seq((101L, "de", 5.0), (102L, "de", 5.0), (103L, "de", 5.0))
    val scored = (en ++ de).toDF("doc_id", "lang", "s")
    val got = TextAnalysis.perplexityBucketsSketch(scored, "lang", "s",
        nBuckets = 3, bins = 256)
      .select("doc_id", "ppl_bin", "ppl_class")
      .as[(Long, Int, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val exact = TextAnalysis.perplexityBuckets(scored, "lang", "s")
      .select("doc_id", "ppl_class").as[(Long, String)].collect().toMap
    (1L to 30L).foreach { i =>
      assert(got(i)._2 == exact(i), s"doc $i: sketch=${got(i)._2} exact=${exact(i)}")
    }
    Seq(101L, 102L, 103L).foreach { i =>
      assert(got(i) == ((0, "head")), s"degenerate lang doc $i: ${got(i)}")
    }
    // fixture-corpus agreement with the exact tiles at the gate's bins=64:
    // error mass is bounded by the two threshold bins per language
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val lm = TextAnalysis.docLogProbBigram(docs)
      .join(docs.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "avg_nll2").localCheckpoint()
    val sk = TextAnalysis.perplexityBucketsSketch(lm, "lang", "avg_nll2",
        nBuckets = 3, bins = 64)
      .select("doc_id", "ppl_class").as[(Long, String)].collect().toMap
    val ex = TextAnalysis.perplexityBuckets(lm, "lang", "avg_nll2")
      .select("doc_id", "ppl_class").as[(Long, String)].collect().toMap
    val agree = sk.count { case (id, c) => ex(id) == c }
    assert(agree.toDouble / sk.size >= 0.9,
      s"sketch/exact agreement ${agree.toDouble / sk.size} < 0.9 (${sk.size} docs)")
  }
}
