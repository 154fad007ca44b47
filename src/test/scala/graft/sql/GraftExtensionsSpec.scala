package graft.sql

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-installation path: `spark.sql.extensions=graft.sql.
  * GraftExtensions` must make every function resolvable with NO call to
  * LshFunctions.register — the Spark analog of DuckDB's `LOAD lsh`
  * (/root/reference/src/lib.rs:40-53). `spark.sql.extensions` is a STATIC
  * conf read from the SparkContext conf at session construction, so
  * TestSpark's builder (the context creator) carries it; this spec proves a
  * brand-new session — fresh SessionState, register() never called on it —
  * still resolves every function through injection alone.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions installs all functions, golden-exact") {
    TestSpark.spark // ensure the shared context exists first
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.extensions", "graft.sql.GraftExtensions")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      // must NOT be the register()-patched test session
      assert(!prevActive.contains(s2))
      val row = s2.sql(
        "SELECT lsh_min('Princeton University', 2, 3, 2, 123) AS h").head()
      assert(row.getSeq[Long](0) == Seq(
        java.lang.Long.parseUnsignedLong("6891191098855684803"),
        java.lang.Long.parseUnsignedLong("6484452798683863108"),
        java.lang.Long.parseUnsignedLong("14488917645112899542")))
      // one probe per injected function, keyed so the list CANNOT silently
      // miss a newly registered function: the assertion below fails the
      // suite when LshFunctions.all grows without a probe here
      val probes = Map(
        "lsh_min" -> "SELECT lsh_min('ab', 2, 1, 1, 1)",
        "lsh_min32" -> "SELECT lsh_min32('ab', 2, 1, 1, 1)",
        "lsh_euclidean" -> "SELECT lsh_euclidean(array(1.0d, 2.0d), 0.5d, 1, 1, 1)",
        "lsh_euclidean32" -> "SELECT lsh_euclidean32(array(1.0d, 2.0d), 0.5d, 1, 1, 1)",
        "lsh_jaccard" -> "SELECT lsh_jaccard('abc', 'abd', 2)",
        "simhash64" -> "SELECT simhash64('hello world')",
        "hamming_dist" -> "SELECT hamming_dist(1L, 3L)",
        "min_fingerprint" -> "SELECT min_fingerprint('hello world', 4)",
        "winnow_fingerprint" -> "SELECT winnow_fingerprint('hello world hello', 4, 5)",
        "shingle_hashes" -> "SELECT shingle_hashes('hello', 2)",
        "hll_distinct" -> "SELECT hll_distinct(t, 10) FROM (SELECT 'x' AS t)",
        "bloom_build" -> "SELECT bloom_build(t, 10, 3) FROM (SELECT 'x' AS t)",
        "bloom_contains" ->
          "SELECT bloom_contains(b, 'x') FROM (SELECT bloom_build(t, 10, 3) AS b FROM (SELECT 'x' AS t))",
        "cms_build" -> "SELECT cms_build(t, 2, 8) FROM (SELECT 'x' AS t)",
        "cms_estimate" ->
          "SELECT cms_estimate(c, 'x') FROM (SELECT cms_build(t, 2, 8) AS c FROM (SELECT 'x' AS t))",
        "hll_sketch" -> "SELECT hll_sketch(t, 8) FROM (SELECT 'x' AS t)",
        "sketch_merge" ->
          "SELECT sketch_merge(s) FROM (SELECT hll_sketch(t, 8) AS s FROM (SELECT 'x' AS t))",
        "hll_estimate" ->
          "SELECT hll_estimate(s) FROM (SELECT hll_sketch(t, 8) AS s FROM (SELECT 'x' AS t))",
        "hist_sketch" -> "SELECT hist_sketch(v, 5) FROM (SELECT 7L AS v)",
        "hist_quantile" ->
          "SELECT hist_quantile(h, 0.5d) FROM (SELECT hist_sketch(v, 5) AS h FROM (SELECT 7L AS v))",
        "ln_pinned" -> "SELECT ln_pinned(2.5d)",
        "cosine_sim" -> "SELECT cosine_sim(array(1.0d, 2.0d), array(2.0d, 4.0d))",
        "topk_by" -> "SELECT topk_by(s, i, 2) FROM (SELECT 1.0d AS s, 7L AS i)",
        "unicode_norm" -> "SELECT unicode_norm('cafe\\u0301'), unicode_norm('x', 'NFKC')",
        "levenshtein_cp" -> "SELECT levenshtein_cp('kitten', 'sitting')",
        "html_extract" -> "SELECT html_extract('<p>a&amp;b</p>')",
        "image_dhash" -> "SELECT image_dhash(CAST(NULL AS BINARY))",
        "image_ahash" -> "SELECT image_ahash(CAST(NULL AS BINARY))",
        "audio_fp" -> "SELECT audio_fp(CAST(NULL AS BINARY))",
        "image_resize" -> "SELECT image_resize(CAST(NULL AS BINARY), 8)")
      assert(probes.keySet == graft.sql.LshFunctions.all.map(_._1).toSet,
        "extension probe list out of sync with LshFunctions.all")
      probes.values.foreach(q => s2.sql(q).collect())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
