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

    val cold = args.contains("cold")
    for (name <- args(0).split(",")) {
      val fn = SparkEntry.queries(name)
      if (!cold) fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache()
      stages.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      println(s"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}s")
      stages.sortBy(-_._2).take(6).foreach { case (id, run, gc, wall, n) =>
        println(f"[scratch]   stage $id%3d run=${run / 1e3}%8.2fs gc=${gc / 1e3}%5.2fs " +
          f"wall=${wall / 1e3}%7.2fs tasks=$n%3d")
      }
      if (args.length > 1 && args(1) == "explain") df.explain("formatted")
    }
    spark.stop()
  }
}
