package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Pins the one-pass contracts won in round 12: operators whose plan used
  * to compute an expensive signature/tokenize subtree ONCE PER CONSUMER
  * (self-join sides, agg + probe branches) now compute it once — either
  * through an explicit bucket repartition the join reads as a
  * ReusedExchange, or by evaluating the flag rule as a window instead of
  * a self-semi-join. A Spark upgrade or refactor that silently breaks the
  * reuse doubles the dominant CPU of the whole mining family; this suite
  * makes that loud. Counts are structural over the FINAL adaptive plan
  * (cache subtrees excluded — InMemoryRelation's printed description
  * embeds its build plan).
  */
class SingleComputeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def liveNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case c: InMemoryTableScanExec => Seq(c)
    // a ReusedExchange is a POINTER to another stage's output, not a
    // recompute — descending into it would double-count the shared subtree
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r)
    case a: AdaptiveSparkPlanExec => liveNodes(a.executedPlan)
    case s: QueryStageExec => liveNodes(s.plan)
    case _ => p +: p.children.flatMap(liveNodes)
  }

  /** Number of live plan nodes computing an expression whose string form
    * mentions `fn` — each counted node is one evaluation site of the
    * expensive kernel. */
  private def computeSites(df: org.apache.spark.sql.DataFrame, fn: String): Int = {
    df.collect()
    liveNodes(df.queryExecution.executedPlan)
      .count(n => n.expressions.exists(_.toString.contains(fn)))
  }

  test("nearDupPairs: the lsh_min banding pass runs once") {
    graft.sql.LshFunctions.register(spark)
    val df = api.BandedLsh.nearDupPairs(docs, "doc_id", "text", 4, 8, 3, 42L, 0.6)
    assert(computeSites(df, "lsh_min") == 1,
      s"banding must compute once:\n${df.queryExecution.executedPlan}")
  }

  test("signatureDupPairs: both lsh_min passes run once") {
    val df = api.BandedLsh.nearDupPairsBySignature(docs, "doc_id", "text",
      4, 8, 3, 42L, k = 24, sigSeed = 77L, threshold = 0.3)
    assert(computeSites(df, "lsh_min") == 1,
      s"banding+signature must compute once:\n${df.queryExecution.executedPlan}")
  }

  test("simhashDupPairs: the simhash pass runs once") {
    val df = api.Dedup.simhashDupPairs(docs, "doc_id", "text", 4, 6)
    assert(computeSites(df, "simhash64") == 1,
      s"simhash must compute once:\n${df.queryExecution.executedPlan}")
  }

  test("cosineLshPairs: the sketch pass runs once") {
    val df = api.Ann.cosineLshPairs(emb, nbits = 64, bands = 8,
      seed = 7L, threshold = 0.3)
    assert(computeSites(df, "cosine_sketch") == 1,
      s"sketching must compute once:\n${df.queryExecution.executedPlan}")
  }

  test("dupSpans: the gram explode runs once (window-form flag rule)") {
    for (crossDoc <- Seq(true, false)) {
      val df = api.Dedup.dupSpans(docs, "doc_id", "text", width = 8,
        crossDocOnly = crossDoc)
      df.collect()
      val generates = liveNodes(df.queryExecution.executedPlan)
        .count(n => n.nodeName.contains("Generate") &&
          n.expressions.exists(_.toString.contains("xxhash64")))
      assert(generates == 1,
        s"crossDocOnly=$crossDoc: gram mining must run once:\n${df.queryExecution.executedPlan}")
    }
  }

  test("dropBoilerplateLines: the line explode runs once") {
    import org.apache.spark.sql.functions._
    // plant real boilerplate: with nothing flagged, AQE's empty-relation
    // propagation prunes the whole lines subtree and the count reads 0
    val planted = docs.select(col("doc_id"),
      concat(lit("subscribe now\n"), col("text")).as("text"))
    val df = api.Dedup.dropBoilerplateLines(planted, "doc_id", "text", 3L)
    df.collect()
    val generates = liveNodes(df.queryExecution.executedPlan)
      .count(_.nodeName.contains("Generate"))
    assert(generates == 1,
      s"line explode must run once:\n${df.queryExecution.executedPlan}")
  }
}
