package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-loop stage profiler — NOT part of the driver contract.
  *
  * Times SparkEntry queries at sf0.1 under the noop sink (one warm pass
  * first, caches cleared between) and prints the heaviest stages with
  * executor run time, GC time, wall time and task count. This is how the
  * round-5 AQE-coalescing and single-split-serialization bottlenecks were
  * found; `run >> wall` means healthy parallelism, `tasks=1` on a heavy
  * stage means a serialized kernel, `wall >> run/tasks` means skew.
  *
  * Usage: runMain graft.Scratch q1_agg[,q2_join_agg,...] [explain|cold]
  *
  * `cold` skips the warm pass and profiles the FIRST run — with fork:=true
  * each runMain is a fresh JVM, so one query per invocation gives its true
  * standalone first-run cost (JIT + codegen + any index/broadcast builds),
  * which is what a 100 TB run-once batch job pays.
  */
object Scratch {
  @volatile private var epochT0: Long = 0L
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      // see Bench.scala: normalizeEventTs's NTZ cast requires a UTC session
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-scratch")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stages += ((si.stageId, si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.numTasks))
      }
    })
    // job-level walls: the lifecycle queries are COMPOSITIONS of many small
    // actions (index writes, meta rewrites, collects) — per-stage numbers
    // can't show which ACTION the wall time sits in, per-job walls can.
    // (jobs, not an O(1) counter: "jobs" mode prints each one.)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobLog = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time,
          Option(js.properties).map(_.getProperty("spark.job.description", "")).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          jobLog.synchronized {
            jobLog += (((t0 - epochT0) / 1e3, (je.time - t0) / 1e3, desc)) }
        }
      }
    })

    val cold = args.contains("cold")
    val showJobs = args.contains("jobs")
    // driver-gap sampler ("gaps" mode): when no Spark job is running but
    // the query is, the MAIN thread is doing driver-side work (planning,
    // fixture building, collects) — sample its stack and histogram the
    // deepest interesting frame (guide §7.3, automated).
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        running.incrementAndGet()
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        running.decrementAndGet()
    })
    val gapHist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val mainThread = Thread.currentThread()
    if (args.contains("gaps")) {
      val t = new Thread(() => {
        while (true) {
          if (sampling && running.get() == 0) {
            val st = mainThread.getStackTrace
            // first frame below the scratch/spark-action plumbing that
            // names a package we care about; fall back to the top frame
            val frame = st.find { e =>
              val c = e.getClassName
              !c.startsWith("java.") && !c.startsWith("scala.") &&
                !c.startsWith("jdk.") && !c.startsWith("sun.")
            }.orElse(st.headOption).map(_.toString).getOrElse("<none>")
            gapHist.merge(frame, 1, (a, b) => a + b)
          }
          Thread.sleep(50)
        }
      }, "graft-gap-sampler")
      t.setDaemon(true)
      t.start()
    }
    for (name <- args(0).split(",")) {
      val fn = SparkEntry.queries(name)
      if (!cold) fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      stages.clear()
      jobLog.synchronized(jobLog.clear())
      val t0 = System.nanoTime()
      epochT0 = System.currentTimeMillis()
      gapHist.clear()
      sampling = true
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      sampling = false
      println(s"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}s")
      if (args.contains("gaps")) {
        val entries = new java.util.ArrayList(gapHist.entrySet())
        entries.sort((a, b) => b.getValue.compareTo(a.getValue))
        entries.forEach(e =>
          println(f"[scratch]   gap ${e.getValue.intValue() * 0.05}%6.2fs  ${e.getKey.take(130)}"))
      }
      stages.sortBy(-_._2).take(6).foreach { case (id, run, gc, wall, n) =>
        println(f"[scratch]   stage $id%3d run=${run / 1e3}%8.2fs gc=${gc / 1e3}%5.2fs " +
          f"wall=${wall / 1e3}%7.2fs tasks=$n%3d")
      }
      if (showJobs) {
        val snap = jobLog.synchronized(jobLog.toVector)
        println(f"[scratch]   ${snap.size} jobs, sum-of-walls=${snap.map(_._2).sum}%.2fs" +
          f" (gaps = driver-side time)")
        snap.foreach { case (start, wall, desc) =>
          println(f"[scratch]   job @${start}%7.2fs wall=${wall}%6.2fs  ${desc.take(110)}")
        }
      }
      if (args.length > 1 && args(1) == "explain") df.explain("formatted")
    }
    spark.stop()
  }
}
