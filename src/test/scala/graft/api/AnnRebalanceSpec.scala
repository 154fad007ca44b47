package graft.api

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Ann.rebalanceIvfPqCells]]'s repair contract beyond the driver
  * gate's full-pipeline hash: untouched cells' rows stay bit-identical, a
  * healthy index is a no-op, the ballooned mass actually spreads below the
  * build-time absolute bar, and search quality survives the repair.
  */
class AnnRebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  /** fit + save + append displaced-diverse drift; returns the full corpus. */
  private def buildDrifted(prefix: String): org.apache.spark.sql.DataFrame = {
    val idx = Ann.fitIvfPq(emb, nlist = 8, m = 4, ksub = 16, seed = 11L, iters = 5)
    Ann.saveIvfPqIndex(idx, prefix)
    val drift = emb.filter(col("vec_id") < 3)
      .crossJoin(spark.range(1, 41).select(col("id").as("__rep")))
      .select((col("vec_id") + col("__rep") * 100000L).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(3.0) + col("__rep").cast("double") * lit(0.05)).as("embedding"))
    Ann.appendToIvfPqIndex(drift, prefix)
    emb.unionByName(drift)
  }

  private def codesMap(prefix: String): Map[Long, (Int, Seq[Byte])] =
    spark.table(s"${prefix}_codes").collect()
      .map(r => r.getAs[Long]("neighbor_id") ->
        (r.getAs[Int]("cell"), r.getAs[scala.collection.Seq[Byte]]("codes").toSeq))
      .toMap

  test("repair spreads ballooned mass; untouched cells stay bit-identical") {
    val prefix = "graft_rebspec_idx"
    val full = buildDrifted(prefix)
    val before = codesMap(prefix)
    val ballooned = Ann.ivfPqIndexHealth(spark, prefix, maxSkew = 1.5)
      .collect().map(_.getAs[Int]("cell")).toSet
    assert(ballooned.nonEmpty, "fixture must balloon at least one cell")
    val report = Ann.rebalanceIvfPqCells(full, prefix, seed = 77L, maxSkew = 1.5)
      .collect()
    assert(report.map(_.getAs[Int]("cell")).toSet == ballooned)
    assert(report.forall(_.getAs[Int]("subcells") >= 2))
    val after = codesMap(prefix)
    assert(after.keySet == before.keySet, "repair must not add or drop rows")
    // rows that sat in untouched cells keep cell AND codes bit-identical;
    // reassigned rows keep their codes (PQ encodes the raw vector under
    // frozen codebooks — only routing changes)
    before.foreach { case (id, (cell, codes)) =>
      if (!ballooned.contains(cell))
        assert(after(id) == ((cell, codes)), s"untouched row $id changed")
      else
        assert(after(id)._2 == codes, s"reassigned row $id lost its codes")
    }
    // the absolute probe-cost bar: no cell holds more than maxSkew x the
    // BUILD-TIME expected occupancy (relative skew re-bases as nlist grows)
    val total = after.size.toDouble
    val counts = after.values.groupBy(_._1).view.mapValues(_.size)
    val bar = 1.5 * total / 8.0
    assert(counts.values.max <= bar,
      s"worst cell ${counts.maxBy(_._2)} still above the absolute bar $bar")
    // and the appended sub-cells actually hold rows
    assert(counts.keys.exists(_ >= 8), "no appended sub-cell was populated")
  }

  test("search quality survives the repair (no degradation; >= 0.9 floor)") {
    val prefix = "graft_rebspec2_idx"
    val full = buildDrifted(prefix)
    val queries = emb.filter(col("vec_id") < 10)
    // candidate recall at a probe fraction: overlap of partial-probe top-10
    // with the full-probe top-10 (full probe == plain-PQ ADC ranking, which
    // the repair leaves bit-identical — codes never change)
    def recallAt(frac: Double): Double = {
      val idx = Ann.loadIvfPqIndex(spark, prefix)
      val nl = idx.centroids.length
      val fullProbe = idx.search(queries, 10, nprobe = nl)
        .select("query_id", "neighbor_id")
      val part = idx.search(queries, 10,
          nprobe = math.max(2, math.ceil(nl * frac).toInt))
        .select("query_id", "neighbor_id")
      val hit = fullProbe.join(part, Seq("query_id", "neighbor_id")).count()
      hit.toDouble / fullProbe.count()
    }
    val halfBefore = recallAt(0.5)
    Ann.rebalanceIvfPqCells(full, prefix, seed = 77L, maxSkew = 1.5)
    val halfAfter = recallAt(0.5)
    // the repair must not meaningfully degrade recall at the same probe
    // FRACTION — note the comparison is slightly unfair to the repaired
    // index: pre-repair, half the cells includes the ballooned cell
    // holding ~40% of all rows (half the cells ≈ most of the mass), while
    // post-repair the same fraction covers genuinely half the mass at a
    // fraction of the scan cost — which is the point of the repair
    assert(halfAfter >= halfBefore - 0.1,
      s"repair degraded half-probe recall: $halfBefore -> $halfAfter")
    // ...and the repaired index clears the quality floor at 3/4 probing
    val floor = recallAt(0.75)
    assert(floor >= 0.9, s"post-repair recall at 3/4 probing $floor < 0.9")
  }

  test("repeated rebalance rounds reach a healthy fixpoint") {
    // the maintenance loop's contract: each round splits what's ballooned
    // UNDER THE CURRENT nlist (appending cells re-bases every skew, so one
    // round can leave re-based stragglers); iterating must converge to an
    // empty health report in a handful of rounds, not oscillate
    val prefix = "graft_rebspec4_idx"
    val full = buildDrifted(prefix)
    var rounds = 0
    while (rounds < 6 &&
        !Ann.ivfPqIndexHealth(spark, prefix, maxSkew = 2.0).isEmpty) {
      val repaired = Ann.rebalanceIvfPqCells(full, prefix, seed = 77L + rounds,
        maxSkew = 2.0).count()
      assert(repaired > 0, "health non-empty but rebalance repaired nothing")
      rounds += 1
    }
    assert(Ann.ivfPqIndexHealth(spark, prefix, maxSkew = 2.0).isEmpty,
      s"still unhealthy after $rounds rebalance rounds")
    assert(rounds >= 1, "fixture must need at least one repair round")
    // convergence did not lose or duplicate rows
    assert(codesMap(prefix).size == full.count())
  }

  test("a healthy index is a no-op") {
    val prefix = "graft_rebspec3_idx"
    val idx = Ann.fitIvfPq(emb, nlist = 4, m = 4, ksub = 16, seed = 11L, iters = 5)
    Ann.saveIvfPqIndex(idx, prefix)
    val before = codesMap(prefix)
    // absurdly high threshold: nothing can balloon
    val report = Ann.rebalanceIvfPqCells(emb, prefix, seed = 77L, maxSkew = 1e9)
    assert(report.isEmpty)
    assert(codesMap(prefix) == before, "no-op must leave the codes table untouched")
    assert(Ann.loadIvfPqIndex(spark, prefix).centroids.length == 4,
      "no-op must leave the model untouched")
  }

  /** fit + save + a big CONCENTRATED append: the original cells end up
    * relatively starved (the merge-repair drift mode). */
  private def buildStarved(prefix: String): org.apache.spark.sql.DataFrame = {
    val idx = Ann.fitIvfPq(emb, nlist = 8, m = 4, ksub = 16, seed = 11L, iters = 5)
    Ann.saveIvfPqIndex(idx, prefix)
    val drift = emb.filter(col("vec_id") < 3)
      .crossJoin(spark.range(1, 301).select(col("id").as("__rep")))
      .select((col("vec_id") + col("__rep") * 100000L).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(3.0) + col("__rep").cast("double") * lit(0.05)).as("embedding"))
    Ann.appendToIvfPqIndex(drift, prefix)
    emb.unionByName(drift)
  }

  test("merge retires starved cells; rows go to each row's nearest survivor; untouched bit-identical") {
    val prefix = "graft_mrgspec_idx"
    val full = buildStarved(prefix)
    val before = codesMap(prefix)
    val idx0 = Ann.loadIvfPqIndex(spark, prefix)
    val populated = before.values.map(_._1).toSet
    val starvedPop = Ann.ivfPqIndexHealth(spark, prefix,
        maxSkew = Double.MaxValue, minSkew = 0.5)
      .filter(col("skew") < 0.5).collect().map(_.getAs[Int]("cell")).toSet
    val emptyLive = idx0.centroids.indices.filterNot(populated).toSet
    assert(starvedPop.nonEmpty, "fixture must starve at least one populated cell")
    val report = Ann.mergeStarvedIvfPqCells(full, prefix, minSkew = 0.5).collect()
    val retired = report.map(_.getAs[Int]("cell")).toSet
    assert(retired == starvedPop ++ emptyLive,
      s"retired $retired != starved $starvedPop + empty $emptyLive")
    // the model marks exactly the retired cells dead; ids never shift
    val idx1 = Ann.loadIvfPqIndex(spark, prefix)
    assert(idx1.deadCells == retired)
    assert(idx1.centroids.length == idx0.centroids.length)
    retired.foreach(c => assert(idx1.centroids(c)(0).isPosInfinity))
    val after = codesMap(prefix)
    assert(after.keySet == before.keySet, "merge must not add or drop rows")
    // every row: untouched cells bit-identical (cell AND codes); starved
    // rows land on their own nearest SURVIVOR with codes carried
    val vecs = full.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Double]]("embedding").toArray).toMap
    def nearestSurvivor(v: Array[Double]): Int =
      idx0.centroids.indices.filterNot(retired)
        .minBy { c =>
          val cent = idx0.centroids(c)
          var d = 0.0; var j = 0
          while (j < v.length) { val t = v(j) - cent(j); d += t * t; j += 1 }
          (d, c)
        }
    before.foreach { case (id, (cell, codes)) =>
      if (!retired.contains(cell))
        assert(after(id) == ((cell, codes)), s"untouched row $id changed")
      else {
        assert(after(id)._2 == codes, s"reassigned row $id lost its codes")
        assert(after(id)._1 == nearestSurvivor(vecs(id)),
          s"row $id landed on ${after(id)._1}, not its nearest survivor")
      }
    }
    // retired partitions are empty, and future appends can't route there
    assert(!after.values.exists(v => retired.contains(v._1)))
    Ann.appendToIvfPqIndex(
      emb.filter(col("vec_id") < 2)
        .select((col("vec_id") + 900000L).as("vec_id"), col("embedding")), prefix)
    val appended = codesMap(prefix).filterKeys(_ >= 900000L)
    assert(appended.nonEmpty && !appended.values.exists(v => retired.contains(v._1)),
      "appends must never route to a dead cell")
    // recall re-gate: partial-probe top-10 containment in full-probe
    // top-10 on the MERGED index clears the same 0.9 floor the rebalance
    // test pins (probe counts in LIVE cells — probes() ranks Inf dead
    // slots last, so they can never occupy a probe while live cells remain)
    val live = idx1.centroids.length - idx1.deadCells.size
    val queries = emb.filter(col("vec_id") < 10)
    val fullProbe = idx1.search(queries, 10, nprobe = live)
      .select("query_id", "neighbor_id")
    val part = idx1.search(queries, 10, nprobe = math.max(2, (live * 3) / 4))
      .select("query_id", "neighbor_id")
    val recall = fullProbe.join(part, Seq("query_id", "neighbor_id")).count()
      .toDouble / fullProbe.count()
    assert(recall >= 0.9, s"post-merge recall at 3/4 live probing $recall < 0.9")
  }

  test("merge report is bounded-sane and a healthy index is a no-op") {
    val prefix = "graft_mrgspec2_idx"
    val idx = Ann.fitIvfPq(emb, nlist = 4, m = 4, ksub = 16, seed = 11L, iters = 5)
    Ann.saveIvfPqIndex(idx, prefix)
    val before = codesMap(prefix)
    // threshold below any real cell's skew: nothing to merge (empty live
    // cells — if any — would still retire, so pick the populated-only case)
    val populated = before.values.map(_._1).toSet
    val report = Ann.mergeStarvedIvfPqCells(emb, prefix, minSkew = 1e-9)
    if (populated.size == 4) {
      assert(report.isEmpty)
      assert(codesMap(prefix) == before)
    } else {
      // only the never-populated cells retire; no rows move
      assert(report.collect().forall(_.getAs[Long]("cell_rows") == 0L))
      assert(codesMap(prefix) == before)
    }
  }

  test("split+merge maintenance rounds reach health clean at BOTH bounds") {
    val prefix = "graft_mrgspec5_idx"
    val full = buildStarved(prefix)
    def health() = Ann.ivfPqIndexHealth(spark, prefix, maxSkew = 2.0, minSkew = 0.3)
    var rounds = 0
    while (rounds < 8 && !health().isEmpty) {
      Ann.rebalanceIvfPqCells(full, prefix, seed = 77L + rounds, maxSkew = 2.0)
      Ann.mergeStarvedIvfPqCells(full, prefix, minSkew = 0.3)
      rounds += 1
    }
    assert(health().isEmpty, s"still unhealthy at both bounds after $rounds rounds")
    assert(rounds >= 1, "fixture must need at least one maintenance round")
    assert(codesMap(prefix).size == full.count(),
      "the maintenance loop must not lose or duplicate rows")
  }

  test("a leftover scratch table makes both repairs refuse loudly") {
    val prefix = "graft_mrgspec3_idx"
    val full = buildStarved(prefix)
    import spark.implicits._
    Seq((1L, 0, Array[Byte](1))).toDF("neighbor_id", "cell", "codes")
      .write.format("parquet").mode("overwrite")
      .saveAsTable(s"${prefix}_rebalance_tmp")
    val eM = intercept[IllegalArgumentException] {
      Ann.mergeStarvedIvfPqCells(full, prefix, minSkew = 0.5)
    }
    assert(eM.getMessage.contains("interrupted"), eM.getMessage)
    val eR = intercept[IllegalArgumentException] {
      Ann.rebalanceIvfPqCells(full, prefix, seed = 77L, maxSkew = 1.2)
    }
    assert(eR.getMessage.contains("interrupted"), eR.getMessage)
    // the refusal must not have touched the index
    spark.sql(s"DROP TABLE `${prefix}_rebalance_tmp`")
    assert(codesMap(prefix).size == full.count())
  }

  test("a stale corpus snapshot fails loudly instead of shrinking the index") {
    val prefix = "graft_mrgspec4_idx"
    val full = buildStarved(prefix)
    // drop some of the DRIFT ids the rebalance would need, and some of the
    // BASE ids the merge would need
    val staleForMerge = full.filter(col("vec_id") < 100000L && col("vec_id") % 7 =!= 0)
    val eM = intercept[IllegalArgumentException] {
      Ann.mergeStarvedIvfPqCells(staleForMerge, prefix, minSkew = 0.5)
    }
    assert(eM.getMessage.contains("missing"), eM.getMessage)
    val eR = intercept[IllegalArgumentException] {
      Ann.rebalanceIvfPqCells(full.filter(col("vec_id") % 2 === 0), prefix,
        seed = 77L, maxSkew = 1.2)
    }
    assert(eR.getMessage.contains("missing"), eR.getMessage)
    // both refusals left the index intact
    assert(codesMap(prefix).size == full.count())
  }

  test("compaction removes exactly the deleted ids; untouched cells bit-identical") {
    val prefix = "graft_cmpspec_idx"
    val full = buildDrifted(prefix)
    val before = codesMap(prefix)
    // delete half the rows of the two lowest populated cells — guarantees
    // some populated cells stay untouched so the bit-identical check bites
    val targetCells = before.values.map(_._1).toSet.toSeq.sorted.take(2).toSet
    val deletedIds = before.collect {
      case (id, (c, _)) if targetCells(c) && id % 2 == 0 => id }.toSet
    assert(deletedIds.nonEmpty, "fixture must delete something")
    import spark.implicits._
    val deleted = deletedIds.toSeq.toDF("vec_id")
    val affectedCells = before.collect {
      case (id, (cell, _)) if deletedIds(id) => cell }.toSet
    assert(affectedCells.nonEmpty &&
      affectedCells.size < before.values.map(_._1).toSet.size,
      "fixture must affect some but not all populated cells")
    val report = Ann.compactIvfPqIndex(spark, prefix, deleted).collect()
    assert(report.map(_.getAs[Int]("cell")).toSet == affectedCells,
      "report must list exactly the affected cells")
    assert(report.map(_.getAs[Long]("removed_rows")).sum ==
      deletedIds.count(before.contains), "removed_rows must sum to the deletions")
    val after = codesMap(prefix)
    assert(after.keySet == before.keySet -- deletedIds,
      "compaction must remove exactly the deleted ids")
    // survivors keep cell AND codes bit-identical — compaction never
    // re-encodes and never re-routes
    after.foreach { case (id, v) => assert(v == before(id), s"row $id changed") }
    // deleting ids absent from the index is a no-op with an empty report
    val noop = Ann.compactIvfPqIndex(spark, prefix,
      Seq(987654321L).toDF("vec_id")).collect()
    assert(noop.isEmpty, "unknown ids must report no affected cells")
    assert(codesMap(prefix) == after, "no-op compaction must not rewrite")
    // search over the compacted index can never surface a deleted id
    val got = Ann.loadIvfPqIndex(spark, prefix)
      .search(emb.filter(col("vec_id") < 5), k = 10, nprobe = 8)
      .select("neighbor_id").collect().map(_.getLong(0)).toSet
    assert(got.intersect(deletedIds).isEmpty,
      "a deleted id surfaced from a compacted index")
  }

  test("reindex refreshes both models, keeps every id, refuses leftover scratches") {
    val prefix = "graft_rxspec_idx"
    val full = buildDrifted(prefix)
    val beforeIds = codesMap(prefix).keySet
    val beforeModel = spark.table(s"${prefix}_model").collect()
      .map(_.toSeq).toSet
    // fresh seed: models must actually change, ids must all survive
    val report = Ann.reindexIvfPq(full, prefix, nlist = 8, m = 4, ksub = 16,
      seed = 13L, iters = 5)
    assert(report.agg(sum(col("cell_rows"))).head().getLong(0) == full.count())
    assert(codesMap(prefix).keySet == beforeIds,
      "reindex must keep exactly the corpus ids")
    assert(spark.table(s"${prefix}_model").collect().map(_.toSeq).toSet
      != beforeModel, "reindex must write FRESH models")
    // the reloaded index searches coherently (new codes under new models)
    val got = Ann.loadIvfPqIndex(spark, prefix)
      .search(emb.filter(col("vec_id") < 3), k = 5, nprobe = 8)
    assert(got.count() == 15)
    // leftover scratch refuses and the live index stays untouched
    val after = codesMap(prefix)
    import spark.implicits._
    Seq((1L, 0, Array[Byte](1))).toDF("neighbor_id", "cell", "codes")
      .write.format("parquet").mode("overwrite")
      .saveAsTable(s"${prefix}_reindex_tmp")
    val e = intercept[IllegalArgumentException] {
      Ann.reindexIvfPq(full, prefix, nlist = 8, m = 4, ksub = 16, seed = 17L)
    }
    assert(e.getMessage.contains("interrupted"), e.getMessage)
    spark.sql(s"DROP TABLE `${prefix}_reindex_tmp`")
    assert(codesMap(prefix) == after, "refusal must leave the index untouched")
  }

  test("admitNovelVectors: exact clones drop, novelty admits, cross-batch state holds") {
    import spark.implicits._
    val prefix = "graft_novspec_idx"
    val corpTbl = "graft_novspec_corpus"
    val base = emb.filter(col("vec_id") < 40)
    val idx = Ann.fitIvfPq(base, nlist = 4, m = 4, ksub = 16, seed = 11L, iters = 5)
    Ann.saveIvfPqIndex(idx, prefix)
    BucketedWrite.dropTable(spark, corpTbl)
    base.write.format("parquet").mode("overwrite").saveAsTable(corpTbl)
    try {
      val fresh = emb.filter(col("vec_id") >= 40 && col("vec_id") < 45)
      val cloneOfBase = emb.filter(col("vec_id") === 7)
        .select((col("vec_id") + 1000L).as("vec_id"), col("embedding"))
      // batch 1: an exact clone of an INDEXED vector drops; genuinely new
      // vectors admit — and an intra-batch identical pair admits TOGETHER
      // (judged against the pre-batch state only, verdict pinned before
      // the appends mutate the searched tables)
      val twinText = emb.filter(col("vec_id") === 41)
        .select((col("vec_id") + 2000L).as("vec_id"), col("embedding"))
      val b1 = fresh.unionByName(cloneOfBase).unionByName(twinText)
      val v1 = Ann.admitNovelVectors(b1, prefix, corpTbl,
          tau = 1e-6, nprobe = 3, kCand = 8)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(v1(1007L) == false, "exact clone of an indexed vector must drop")
      assert((40L until 45L).forall(v1(_)), "novel vectors must admit")
      assert(v1(2041L), "intra-batch twin admits with its sibling (pre-batch state only)")
      // batch 2: clones of batch-1 ADMITS must drop on the appended state
      val b2 = emb.filter(col("vec_id") === 42)
        .select((col("vec_id") + 3000L).as("vec_id"), col("embedding"))
        .unionByName(emb.filter(col("vec_id") === 41)
          .select((col("vec_id") + 4000L).as("vec_id"), col("embedding")))
      val v2 = Ann.admitNovelVectors(b2, prefix, corpTbl,
          tau = 1e-6, nprobe = 3, kCand = 8)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(v2 == Map(3042L -> false, 4041L -> false),
        s"clones of batch-1 admits must drop cross-batch, got $v2")
      // both stores hold exactly base + batch-1 admits
      val wantIds = (0L until 45L).toSet + 2041L
      assert(codesMap(prefix).keySet == wantIds)
      assert(spark.table(corpTbl).select("vec_id").collect()
        .map(_.getLong(0)).toSet == wantIds,
        "raw corpus store must track the index")
      // re-ingesting an ALREADY-INDEXED id drops on the id guard alone —
      // the similarity path can't see it (search excludes query==neighbor)
      // and appending would duplicate the id in both stores
      val reingest = emb.filter(col("vec_id") === 7) // same id, same vector
      val v3 = Ann.admitNovelVectors(reingest, prefix, corpTbl,
          tau = 1e-6, nprobe = 3, kCand = 8)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(v3 == Map(7L -> false), s"re-crawled id must drop, got $v3")
      assert(codesMap(prefix).keySet == wantIds, "no duplicate id may land")
      // an empty batch returns an empty verdict, not an exception
      assert(Ann.admitNovelVectors(emb.filter(col("vec_id") < 0), prefix,
        corpTbl, tau = 1e-6, nprobe = 3).isEmpty)
      // a batch carrying the SAME id twice collapses to one row before
      // anything runs — two appends of one id would duplicate it in both
      // stores and break the repairs' corpus-coverage assertion
      val twice = emb.filter(col("vec_id") === 46)
        .select(lit(5046L).as("vec_id"), col("embedding"))
      val vDup = Ann.admitNovelVectors(twice.unionByName(twice), prefix,
          corpTbl, tau = 1e-6, nprobe = 3, kCand = 8)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(vDup == Map(5046L -> true), s"dup-id batch must admit once, got $vDup")
      assert(spark.table(corpTbl).filter(col("vec_id") === 5046L).count() == 1L &&
        spark.table(s"${prefix}_codes").filter(col("neighbor_id") === 5046L).count() == 1L,
        "duplicate intra-batch id must land exactly once in each store")
      // crash-window convergence: raw row landed, codes append died.
      // A re-run of the same batch must re-admit the id (codes-side
      // freshness guard), complete the codes append, and NOT duplicate
      // the raw row (corpus-side guard)
      val orphan = emb.filter(col("vec_id") === 47)
        .select(lit(6047L).as("vec_id"), col("embedding"))
      orphan.write.mode("append").insertInto(corpTbl) // simulate the crash
      val vRerun = Ann.admitNovelVectors(orphan, prefix, corpTbl,
          tau = 1e-6, nprobe = 3, kCand = 8)
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(vRerun == Map(6047L -> true),
        s"re-run after a crash between the appends must converge, got $vRerun")
      assert(spark.table(corpTbl).filter(col("vec_id") === 6047L).count() == 1L,
        "re-run must not duplicate the orphan raw row")
      assert(spark.table(s"${prefix}_codes")
        .filter(col("neighbor_id") === 6047L).count() == 1L,
        "re-run must backfill the codes row")
    } finally {
      for (t <- Seq(s"${prefix}_codes", s"${prefix}_model", corpTbl))
        spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("compaction refuses a leftover scratch from an interrupted repair") {
    val prefix = "graft_cmpspec2_idx"
    val full = buildDrifted(prefix)
    import spark.implicits._
    Seq((1L, 0, Array[Byte](1))).toDF("neighbor_id", "cell", "codes")
      .write.format("parquet").mode("overwrite")
      .saveAsTable(s"${prefix}_rebalance_tmp")
    val e = intercept[IllegalArgumentException] {
      Ann.compactIvfPqIndex(spark, prefix,
        full.select("vec_id").filter(col("vec_id") % 9 === 0))
    }
    assert(e.getMessage.contains("interrupted"), e.getMessage)
    spark.sql(s"DROP TABLE `${prefix}_rebalance_tmp`")
    assert(codesMap(prefix).size == full.count())
  }
}
