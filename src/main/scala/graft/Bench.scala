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
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // sessionize_stream is the driver-correctness replay harness: its cost
    // is single-threaded MemoryStream feeding + per-micro-batch scheduling,
    // not engine throughput (sessionize_batch is the throughput twin) — a
    // bench row for it would measure the harness, so it's excluded.
    val notBenchable = Set("sessionize_stream", "stream_neardup_candidates",
      "stream_dedup_content", "stream_windowed_counts", "stream_hll_users",
      "stream_hist_quantiles", "stream_cms_userfreq")
    // SPARK_GRAFT_ONLY=q1_agg,lsh_min_text runs a subset (dev loop tool)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      !notBenchable.contains(n) && only.forall(_.contains(n)) }

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
        // a failed query must read as a failure in the JSON, not as a
        // near-zero-latency success: record NaN and log the error
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
              false
          }
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else Double.NaN)
      }
    }

    val cold = runAll()
    val warm = runAll()
    val warm2 = runAll()
    // best-of-3 over the passes that succeeded: one-off GC/compilation/noise
    // spikes don't get attributed to a query; a query that failed every pass
    // reports -1 (NaN would be invalid JSON) and is excluded from the total
    val best = cold.map { case (k, _) =>
      val ok = Seq(cold(k), warm(k), warm2(k)).filterNot(_.isNaN)
      k -> (if (ok.nonEmpty) ok.min else -1.0)
    }
    val qs = best.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val coldQs = cold.map { case (k, v) =>
      "\"" + k + "\":" + (if (v.isNaN) -1.0 else v) }.mkString("{", ",", "}")
    val total = best.values.filter(_ >= 0).sum
    val coldTotal = cold.values.filterNot(_.isNaN).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold_queries":$coldQs,"cold_total_sec":$coldTotal,"sf":"$sfDir"}"""
    println(json)
    // stdout is buried in sbt/log4j noise, so the driver's parse of the line
    // above fails (`BENCH_r*.json: "parsed": null`); a file with nothing else
    // in it is the machine-readable channel. A SPARK_GRAFT_ONLY dev-loop
    // subset must NOT overwrite it — a partial total is indistinguishable
    // from a full run — unless an explicit out path says otherwise.
    val explicitOut = sys.env.get("SPARK_GRAFT_BENCH_OUT")
    if (only.isEmpty || explicitOut.isDefined) {
      val outFile = explicitOut.getOrElse("BENCH.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
