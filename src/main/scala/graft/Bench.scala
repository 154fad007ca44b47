package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints ONE JSON line.
  *
  * Each query runs twice; the reported time is the second (steady-state) run,
  * so JVM/codegen warmup and OS page-cache effects on the first query of the
  * session don't get attributed to whichever query happens to run first. The
  * first-pass total is reported separately as `cold_total_sec`.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_ONLY=q1_agg,lsh_min_text runs a subset (dev loop tool)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) => only.forall(_.contains(n)) }

    // Sink every query through the noop data source: full evaluation of every
    // output column, zero I/O. A count() action here would let Catalyst prune
    // the very expressions being benchmarked — for projection-only queries
    // (lsh_jaccard_*, text_stats, lang_id, ...) count() collapses to a scan
    // row-count and times nothing.
    def runAll(): Map[String, Double] = {
      // each pass starts cache-cold: intra-pass plan-cache reuse
      // (minhash_dedup_pairs -> dedup_clusters) is a real shared-work win and
      // stays, but a later PASS must not read pairs materialized by an
      // earlier one or its numbers are cached-read fiction
      spark.catalog.clearCache()
      selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        } catch { case _: Throwable => }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    val cold = runAll()
    val warm = runAll()
    val warm2 = runAll()
    // best-of-3: one-off GC/compilation/system-noise spikes on any pass
    // don't get attributed to a query
    val best = cold.map { case (k, v) => k -> math.min(v, math.min(warm(k), warm2(k))) }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (best.nonEmpty) best.values.sum else 0.0
    val coldTotal = if (cold.nonEmpty) cold.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_total_sec":$coldTotal,"sf":"$sfDir"}""")
    spark.stop()
  }
}
