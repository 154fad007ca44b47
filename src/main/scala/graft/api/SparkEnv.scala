package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small shared accessors for Spark runtime configuration. */
private[graft] object SparkEnv {

  /** `spark.sql.shuffle.partitions` as an Int, falling back to
    * `sparkContext.defaultParallelism` when the conf holds a non-numeric
    * value — deployments that set it to `"auto"` (or any vendor-specific
    * token) would otherwise throw NumberFormatException from every operator
    * that sizes a strict repartition off it. The fallback matches what such
    * deployments mean: "size shuffles to the cluster".
    *
    * The no-default `conf.get` is deliberate: on an unset session it
    * returns the registered default ("200"), while `conf.get(key, "")`
    * would VALIDATE the empty-string fallback against the registered
    * intConf and throw on every stock session (verified against the
    * shipped Spark 4.1.2). The Try covers hypothetical sessions where even
    * the registered lookup fails. */
  def shufflePartitions(spark: SparkSession): Int =
    scala.util.Try(spark.conf.get("spark.sql.shuffle.partitions")).toOption
      .flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(spark.sparkContext.defaultParallelism)

  /** `graft.ann.maxQueryRows` (default 100 000): the enforced ceiling on the
    * ANN query-batch size — every ANN path collects or broadcasts the query
    * side, so an unbounded batch OOMs the driver silently. Unregistered
    * runtime conf: `conf.get` throws NoSuchElementException when unset, so
    * the Try IS the default path, not just armor. */
  def annMaxQueryRows(spark: SparkSession): Int =
    scala.util.Try(spark.conf.get("graft.ann.maxQueryRows")).toOption
      .flatMap(_.toIntOption).filter(_ > 0)
      .getOrElse(100000)

  /** Pin a CORPUS-SIZED frontier that several downstream consumers (or
    * several actions) re-read: `localCheckpoint` — evaluate once,
    * truncate every downstream plan (the measured warc_to_shards
    * ~8 s/pass Catalyst/AQE replanning win) — but at a REPLICATED
    * storage level on a real cluster. A plain localCheckpoint severs the
    * lineage AND stores single-replica executor-local blocks, so at
    * 100 TB one lost executor fails every downstream action outright;
    * MEMORY_AND_DISK_2 keeps a second replica, so a single node loss
    * reads the survivor (the residual risk, stated: losing BOTH
    * replicas still fails the job — a pipeline that cannot accept that
    * should write the frontier to a reliable store instead, the staged
    * tables the lifecycle operators already use). Local mode keeps the
    * unreplicated level: one block manager means replication is a no-op
    * that only logs per-block warnings, and the driver's bench stays
    * comparable.
    *
    * Measured alternative, rejected: persist(MEMORY_AND_DISK) keeps
    * lineage (recompute-on-loss) but loses the plan-truncation win —
    * every downstream action re-canonicalizes the full multi-thousand-
    * node tree against the cache (warc_to_shards 7.2 → 14.2 s,
    * curate_corpus_v2 5.2 → 7.0 s on the bench of record). */
  def pinFrontier(df: DataFrame): DataFrame =
    df.localCheckpoint(true,
      if (df.sparkSession.sparkContext.isLocal)
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_2)

  /** Round-robin repartition to the session's shuffle parallelism — but ONLY
    * for a narrow scan (scan/project/filter chain) whose planned partitioning
    * is below it, which is what makes this a layout fix rather than a scale
    * pessimization. A single-row-group parquet file scans as ONE task, so
    * every per-row kernel fused into that stage (tokenize, regex, sketch
    * update, hash chain) runs serialized no matter how many cores the
    * session has — measured as the dominant cold cost of the sketch/token
    * queries on the one-row-group fixtures. At real scale the scan has at
    * least `spark.sql.shuffle.partitions` splits and this returns the input
    * unchanged, exchange-free.
    *
    * Inputs that already contain a shuffle (joins, aggregates) return
    * unchanged WITHOUT probing: their exchange already set the parallelism,
    * and — the sharp edge — probing them via `.rdd` under AQE would
    * materialize every upstream query stage eagerly (real jobs at
    * plan-construction time, re-run on execution) and would read the
    * AQE-coalesced partition count, round-robin-shuffling a large
    * intermediate to "fix" it. Narrow scan plans never go adaptive, so the
    * `.rdd` partition probe there plans the scan but runs no job. Callers
    * must only spread inputs to order-independent work (counts, mergeable
    * sketches, per-row projections that re-sort downstream). */
  def spread(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LeafNode, LogicalPlan, Project, SubqueryAlias}
    def narrowScan(p: LogicalPlan): Boolean = p match {
      case _: LeafNode => true
      case p: Project => narrowScan(p.child)
      case f: LFilter => narrowScan(f.child)
      case s: SubqueryAlias => narrowScan(s.child)
      case _ => false
    }
    val n = shufflePartitions(df.sparkSession)
    if (!narrowScan(df.queryExecution.optimizedPlan)) df
    else if (df.rdd.getNumPartitions >= n) df
    else df.repartition(n)
  }
}
