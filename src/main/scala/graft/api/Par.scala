package graft.api

/** Overlap INDEPENDENT Spark actions from driver threads — the
  * spark_optimization_guide §2.6 pattern ("actions are only sequential
  * because your driver code calls them sequentially"). The composed
  * lifecycle operators ([[IncrementalCuration]], [[StagedPipeline]]) are
  * chains of many small jobs (index writes, tiny aggregates, table
  * rewrites); run sequentially each pays the full scheduler floor and the
  * cluster idles through every tail. Submitting the independent ones
  * concurrently lets the next job's tasks back-fill executors freed by the
  * current job's stragglers — a win that GROWS with cluster size (the
  * bigger the cluster, the more of it a single small job leaves idle).
  *
  * Semantics: runs every thunk, propagates the FIRST failure (remaining
  * thunks still run to completion — each is an independent table write
  * whose partial success is exactly as recoverable as under the
  * sequential order; callers' crash contracts already treat "some
  * writes landed" as the torn state to refuse on). Results return in
  * input order. Each task name labels its thread's jobs (descriptions
  * are thread-local, guide §1.5) via the session the first thunk runs
  * under — callers pass `spark` so the label lands on the right context.
  *
  * Parallelism is bounded (2-3 jobs in flight is the guide's guidance:
  * enough to fill the tail, not so many that they fight) and the pool is
  * per-call — these are coarse multi-second phases, thread spin-up is
  * noise. */
private[graft] object Par {
  def run[T](spark: org.apache.spark.sql.SparkSession,
             tasks: Seq[(String, () => T)], parallelism: Int = 3): Seq[T] = {
    if (tasks.isEmpty) return Seq.empty
    if (tasks.size == 1) return Seq(tasks.head._2())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, tasks.size),
      new java.util.concurrent.ThreadFactory {
        private val n = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
    try {
      val futures = tasks.map { case (desc, body) =>
        pool.submit(new java.util.concurrent.Callable[T] {
          def call(): T = {
            spark.sparkContext.setJobDescription(desc)
            try body() finally spark.sparkContext.setJobDescription(null)
          }
        }) -> desc
      }
      // await ALL before rethrowing: a half-awaited bundle would leave
      // writes racing the caller's next (dependent) action
      val results = futures.map { case (f, desc) =>
        try Right(f.get())
        catch {
          case e: java.util.concurrent.ExecutionException =>
            Left((desc, e.getCause))
        }
      }
      // rethrow the ORIGINAL exception, not a wrapper: callers' refusal
      // contracts are typed (require → IllegalArgumentException, torn
      // state → IllegalStateException) and spec-pinned on those types
      results.collectFirst { case Left((_, cause)) => throw cause }
      results.map(_.toOption.get)
    } finally pool.shutdown()
  }
}
