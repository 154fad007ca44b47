package graft.sql

import graft.TestSpark
import graft.core.{HyperLogLog, Shingles, SimHash}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** hll_distinct: the mergeable HyperLogLog aggregate. Pins the kernel spec,
  * the Spark surfaces (SQL + DataFrame), and the properties that matter at
  * scale: partitioning/order invariance (the sketch is a per-register max)
  * and calibrated accuracy of the raw estimator. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kernelEstimate(values: Seq[String], p: Int): Double = {
    val regs = new Array[Byte](1 << p)
    values.foreach { v =>
      val cps = Shingles.codePoints(v)
      HyperLogLog.add(regs, SimHash.tokenHash(cps, cps.length), p)
    }
    HyperLogLog.estimate(regs)
  }

  test("raw estimate within 3 standard errors across cardinalities") {
    // the raw estimator is only calibrated for n >> 2.5*m (the pinned spec
    // omits the ln-based small-range correction) — test in that regime
    val p = 10
    val se = 1.04 / math.sqrt((1 << p).toDouble)
    for (n <- Seq(10000, 50000, 200000)) {
      val est = kernelEstimate((0 until n).map(i => s"token_$i"), p)
      assert(math.abs(est - n) / n < 3 * se,
        s"n=$n estimate=$est off by ${math.abs(est - n) / n}")
    }
  }

  test("linear counting makes small cardinalities near-exact") {
    // below the raw range the estimator switches to m*ln(m/V) with the
    // engine-pinned ln — the regime every sparse group (streaming windows,
    // rare strata) lives in
    assert(kernelEstimate(Nil, 10) == 0.0)
    for (n <- Seq(1, 5, 50, 500)) {
      val est = kernelEstimate((0 until n).map(i => s"u$i"), 10)
      assert(math.abs(est - n) <= math.max(1.0, 0.05 * n),
        s"n=$n estimate=$est")
    }
  }

  test("lnPinned tracks libm ln to a few ulps on the linear-counting domain") {
    for (x <- Seq(1.0, 1.0000001, 1.5, 2.0, 3.14159, 10.0, 1024.0, 65536.0, 1e12)) {
      val got = HyperLogLog.lnPinned(x)
      val want = math.log(x)
      assert(math.abs(got - want) <= 16 * math.ulp(math.max(want, 1.0)),
        s"x=$x got=$got want=$want")
    }
    intercept[IllegalArgumentException](HyperLogLog.lnPinned(0.5))
  }

  test("estimate is insensitive to duplication, order, and partitioning") {
    val tokens = (0 until 3000).map(i => s"w$i")
    val base = tokens.toDF("t").agg(graft.functions.hll_distinct($"t", 10))
      .head.getDouble(0)
    // duplicates don't move a distinct sketch
    val dup = (tokens ++ tokens ++ tokens.reverse).toDF("t")
      .agg(graft.functions.hll_distinct($"t", 10)).head.getDouble(0)
    assert(dup == base)
    // partitioning changes which partial sketches exist, not their merge
    val repart = tokens.toDF("t").repartition(7)
      .agg(graft.functions.hll_distinct($"t", 10)).head.getDouble(0)
    assert(repart == base)
    // and the Spark value equals the kernel run sequentially
    assert(base == kernelEstimate(tokens, 10))
  }

  test("SQL surface, grouping, and null handling") {
    Seq(("a", Some("x")), ("a", Some("y")), ("a", None), ("b", Some("x")))
      .toDF("g", "t").createOrReplaceTempView("sketch_in")
    val rows = spark.sql(
      "SELECT g, hll_distinct(t, 12) AS est FROM sketch_in GROUP BY g ORDER BY g")
      .collect()
    assert(rows.length == 2)
    // nulls are ignored: group a saw exactly {x, y}, group b exactly {x}
    assert(rows(0).getDouble(1) == kernelEstimate(Seq("x", "y"), 12))
    assert(rows(1).getDouble(1) == kernelEstimate(Seq("x"), 12))
  }

  test("p is validated at analysis time") {
    val df = Seq("a").toDF("t")
    val e = intercept[Exception] {
      df.agg(graft.functions.hll_distinct($"t", 3)).collect()
    }
    assert(e.getMessage.contains("p must be in [4, 16]"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT hll_distinct(t, id) FROM (SELECT 'a' AS t, 1 AS id)")
        .collect()
    }
    assert(e2.getMessage.contains("constant"))
  }

  test("tokenHashUtf8 equals the code-point token hash across unicode planes") {
    val rng = new scala.util.Random(11)
    val samples = Seq("", "a", "hello world", "héllo", "日本語テキスト",
      "emoji 😀 pair", "mixed ascii ünd 中文 🌀") ++
      (0 until 50).map(_ => rng.alphanumeric.take(rng.nextInt(30)).mkString)
    for (s <- samples) {
      val cps = Shingles.codePoints(s)
      val viaCps = SimHash.tokenHash(cps, cps.length)
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      assert(SimHash.tokenHashUtf8(bytes, 0, bytes.length) == viaCps, s"for '$s'")
    }
  }

  test("merge is an elementwise register max (kernel)") {
    val a = new Array[Byte](16); val b = new Array[Byte](16)
    a(3) = 5; b(3) = 2; b(9) = 7
    HyperLogLog.mergeInto(a, b)
    assert(a(3) == 5 && a(9) == 7)
    intercept[IllegalArgumentException] {
      HyperLogLog.mergeInto(new Array[Byte](16), new Array[Byte](32))
    }
  }

  test("bloom filter: no false negatives, partitioning-invariant bits") {
    val keys = (0 until 2000).map(i => s"key$i")
    val df = keys.toDF("k")
    val bloom = df.agg(graft.functions.bloom_build($"k", 14, 4).as("b"))
    // every inserted key probes true, across a repartitioned rebuild too
    val probed = df.crossJoin(bloom)
      .select(graft.functions.bloom_contains($"b", $"k").as("hit"))
      .collect()
    assert(probed.forall(_.getBoolean(0)))
    val bits = bloom.head.getAs[Array[Byte]](0)
    val bits7 = df.repartition(7).agg(graft.functions.bloom_build($"k", 14, 4))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bits, bits7))
    // non-members are mostly rejected (fpp at this sizing ~ <5%)
    val misses = (0 until 1000).map(i => s"other$i").toDF("k")
      .crossJoin(bloom)
      .filter(graft.functions.bloom_contains($"b", $"k"))
      .count()
    assert(misses < 100, s"false-positive count $misses out of 1000")
  }

  test("count-min: estimate >= truth, exact for skewed heavy hitter") {
    val rows = Seq.fill(500)("heavy") ++ (0 until 200).map(i => s"light$i")
    val df = rows.toDF("t")
    val cms = df.agg(graft.functions.cms_build($"t", 4, 10).as("c"))
    val est = df.distinct().crossJoin(cms)
      .select($"t", graft.functions.cms_estimate($"c", $"t").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("heavy") >= 500)
    // with 201 distinct values in 4x1024 counters collisions are rare; the
    // heavy hitter dominates any collided cell, so its min-row is exact
    assert(est("heavy") == 500)
    (0 until 200).foreach(i => assert(est(s"light$i") >= 1))
    // partitioning invariance of the counter grid
    val a = cms.head.getAs[Array[Byte]](0)
    val b = df.repartition(5).agg(graft.functions.cms_build($"t", 4, 10))
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("sketch algebra: persisted states re-aggregate to the flat result") {
    // two-level HLL rollup == flat estimate (merge associativity)
    val df = (0 until 5000).map(i => (i % 7, s"k${i % 1300}")).toDF("g", "t")
    val flat = df.agg(graft.functions.hll_distinct($"t", 10)).head.getDouble(0)
    val rolled = df.groupBy("g")
      .agg(graft.functions.hll_sketch($"t", 10).as("sk"))
      .agg(graft.functions.hll_estimate(graft.functions.sketch_merge($"sk")))
      .head.getDouble(0)
    assert(rolled == flat)
    // bloom states OR together: the merged filter contains both halves
    val bloomOf = (r: org.apache.spark.sql.DataFrame) =>
      r.agg(graft.functions.bloom_build($"t", 10, 3).as("b"))
    val merged = bloomOf(Seq("left").toDF("t"))
      .union(bloomOf(Seq("right").toDF("t")))
      .agg(graft.functions.sketch_merge($"b").as("b"))
    val hits = merged.select(
      graft.functions.bloom_contains($"b", lit("left")),
      graft.functions.bloom_contains($"b", lit("right")),
      graft.functions.bloom_contains($"b", lit("neither"))).head
    assert(hits.getBoolean(0) && hits.getBoolean(1) && !hits.getBoolean(2))
    // cms states ADD together: counts accumulate across persisted sketches
    val cmsOf = (n: Int) => Seq.fill(n)("x").toDF("t")
      .agg(graft.functions.cms_build($"t", 2, 8).as("c"))
    val total = cmsOf(3).union(cmsOf(4))
      .agg(graft.functions.sketch_merge($"c").as("c"))
      .select(graft.functions.cms_estimate($"c", lit("x"))).head.getLong(0)
    assert(total == 7L)
    // merging different shapes fails loudly
    val bad = intercept[Exception] {
      bloomOf(Seq("a").toDF("t")).union(cmsOf(1).withColumnRenamed("c", "b"))
        .agg(graft.functions.sketch_merge($"b")).collect()
    }
    assert(bad.getMessage.contains("different"), bad.getMessage)
  }

  test("hist_sketch: bounded-error quantiles, exact in the linear region") {
    import graft.core.Sketches
    // linear region (< 2^b): buckets are exact, so quantiles are exact
    val small = (1L to 20L) ++ (1L to 20L)
    val dfS = small.toDF("v")
      .agg(graft.functions.hist_sketch($"v", 5).as("h"))
      .select(graft.functions.hist_quantile($"h", 0.5),
        graft.functions.hist_quantile($"h", 1.0))
      .head
    assert(dfS.getLong(0) == 10L && dfS.getLong(1) == 20L)
    // log region: relative error bounded by 2^-b
    val big = (1 to 10000).map(i => i.toLong * 37L)
    val q90 = big.toDF("v")
      .agg(graft.functions.hist_sketch($"v", 5).as("h"))
      .select(graft.functions.hist_quantile($"h", 0.9)).head.getLong(0)
    val exact = big.sorted.apply(math.ceil(0.9 * big.size).toInt - 1)
    assert(math.abs(q90 - exact).toDouble / exact <= 1.0 / 32 + 1e-9,
      s"q90=$q90 exact=$exact")
    // partitioning invariance + rollup through sketch_merge
    val flat = big.toDF("v").agg(graft.functions.hist_sketch($"v", 5))
      .head.getAs[Array[Byte]](0)
    val rolled = big.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("g", "v")
      .groupBy("g").agg(graft.functions.hist_sketch($"v", 5).as("h"))
      .agg(graft.functions.sketch_merge($"h")).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(flat, rolled))
    // empty histogram and negative input
    assert(Sketches.histQuantileBytes(Sketches.toBytes(Sketches.histEmpty(5)), 0.5) == -1L)
    intercept[Exception] {
      Seq(-1L).toDF("v").agg(graft.functions.hist_sketch($"v", 5)).collect()
    }
  }

  test("probe expressions compile under strict whole-stage codegen") {
    // fallback=false turns a broken doGenCode into a hard error instead of
    // a silent interpreted fallback — this pins that the probes really run
    // inside the generated scan loop
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = (0 until 100).map(i => s"v$i").toDF("t")
      val sk = df.agg(
        graft.functions.bloom_build($"t", 10, 3).as("b"),
        graft.functions.cms_build($"t", 2, 8).as("c"),
        graft.functions.hll_sketch($"t", 8).as("h"))
      val r = df.crossJoin(sk).select(
        graft.functions.bloom_contains($"b", $"t"),
        graft.functions.cms_estimate($"c", $"t"),
        graft.functions.hll_estimate($"h")).collect()
      assert(r.length == 100 && r.forall(_.getBoolean(0)))
      assert(r.forall(_.getLong(1) >= 1L))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("sketch SQL surface and shape validation") {
    Seq("x", "y").toDF("t").createOrReplaceTempView("sketch_sql_in")
    val r = spark.sql(
      """SELECT bloom_contains(b, 'x') AS hx, bloom_contains(b, 'zz') AS hz,
        |       cms_estimate(c, 'x') AS ex
        |FROM (SELECT bloom_build(t, 10, 3) AS b, cms_build(t, 2, 8) AS c
        |      FROM sketch_sql_in)""".stripMargin).head
    assert(r.getBoolean(0) && !r.getBoolean(1) && r.getLong(2) == 1L)
    val e = intercept[Exception] {
      Seq("x").toDF("t").agg(graft.functions.bloom_build($"t", 40, 3)).collect()
    }
    assert(e.getMessage.contains("log2m must be in [6, 30]"))
    // probing garbage binary fails loudly, not with an index error
    val g = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("b")
        .select(graft.functions.bloom_contains($"b", lit("x"))).collect()
    }
    assert(g.getMessage.contains("not a sketch binary"), g.getMessage)
  }
}
