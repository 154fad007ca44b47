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
      // one probe per remaining injected function: resolution is the point
      val probes = Seq(
        "SELECT lsh_min32('ab', 2, 1, 1, 1)",
        "SELECT lsh_euclidean(array(1.0d, 2.0d), 0.5d, 1, 1, 1)",
        "SELECT lsh_euclidean32(array(1.0d, 2.0d), 0.5d, 1, 1, 1)",
        "SELECT lsh_jaccard('abc', 'abd', 2)",
        "SELECT simhash64('hello world')",
        "SELECT hamming_dist(1L, 3L)",
        "SELECT min_fingerprint('hello world', 4)",
        "SELECT winnow_fingerprint('hello world hello', 4, 5)")
      probes.foreach(q => s2.sql(q).collect())
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
