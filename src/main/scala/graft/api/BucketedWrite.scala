package graft.api

import org.apache.spark.sql.DataFrame

/** Shared writer for persisted index layouts ([[Ann.saveBucketedCorpus]],
  * [[BandedLsh.saveSignatureIndex]]): a parquet table bucketed AND sorted on
  * the join keys, so downstream equi-joins on those keys read the table with
  * zero exchange — the bucketed scan satisfies the join's required
  * distribution by itself. */
private[graft] object BucketedWrite {

  /** DROP TABLE plus warehouse-dir cleanup: with an in-memory catalog the
    * table registration dies with the JVM but its warehouse directory
    * survives, and CREATE refuses the orphaned location — best-effort
    * cleanup for unqualified names, resolved against the CURRENT
    * database via `defaultTablePath` (under `USE mydb` the orphan lives
    * in `<warehouse>/mydb.db/`, not at the warehouse root). */
  def dropTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    if (!table.contains('.')) {
      // defaultTablePath, not a warehouse-root concat: the orphan dir of
      // a current-database table lives under `<db>.db/` when a session
      // has USE'd off the default database
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(table.toLowerCase)))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  /** True if `name` survives as a catalog entry OR a warehouse directory —
    * the leftover-scratch probe every staged commit refuses on. An
    * interrupted run in a dead JVM leaves the files but not the
    * (in-memory) catalog entry, so the directory must be checked too —
    * resolved via the session catalog's `defaultTablePath` (honors the
    * CURRENT database, `warehouse/<db>.db/<name>`, and database-level
    * locations), NOT `warehouse.dir` string concatenation, which misses
    * orphans outside the default database and would let a staged
    * overwrite destroy the only copy of already-dropped rows. */
  def scratchLeftover(spark: org.apache.spark.sql.SparkSession,
                      name: String): Boolean =
    spark.catalog.tableExists(name) || {
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(
          org.apache.spark.sql.catalyst.TableIdentifier(name.toLowerCase)))
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(loc)
    }

  /** Strict-width-by-bytes staging for bucketed writes (guide §6: output
    * files in the 128 MB–1 GB range; §2.2: fewer, larger blocks). A
    * bucketed write emits one file per (input task × bucket present), so
    * an un-repartitioned write at `spark.sql.shuffle.partitions = 32`
    * over `numBuckets = 8` lays down up to 256 files per generation for
    * kilobytes of data — measured 1280 files / 11 MB on one day-2 gram
    * index at sf0.1, and every later scan (every probe, every flag
    * derivation, every compaction) pays that listing + open floor; at
    * 100 TB on an object store the same shape is the small-files
    * pathology outright. The fix is a BUCKET-ALIGNED strict repartition
    * sized by the frame's estimated bytes, never by the session's core
    * count: width = numBuckets × ceil(chunks / numBuckets) where chunks
    * ≈ bytes / 128 MB — at toy scale that is exactly numBuckets files
    * (one per bucket, which also lets the bucketed scan report its sort
    * order: Spark only trusts per-bucket ordering at one file per
    * bucket), at real scale it is ~128 MB files and a write parallelism
    * that grows with the data. Aligned means numBuckets divides the
    * width, so each write task holds exactly ONE bucket (repartition and
    * the bucket spec share the Murmur3 `hash(keys) pmod w` family).
    * When the plan's size estimate is unusable (joins can inflate to
    * Long.MaxValue), fall back to the session's shuffle width rounded up
    * to bucket alignment — the pre-fix parallelism, still ≥4× fewer
    * files. */
  def bucketAlignedWidth(df: DataFrame, numBuckets: Int): Int = {
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = 128L * 1024 * 1024
    val sp = SparkEnv.shufflePartitions(df.sparkSession)
    val chunks =
      if (est <= 0 || est >= BigInt(Long.MaxValue) / 4) sp.toLong
      else math.min(1L << 20, (est / target).toLong + 1L)
    val m = math.max(1L, (chunks + numBuckets - 1) / numBuckets)
    (numBuckets * m).toInt
  }

  def saveBucketed(df: DataFrame, table: String, numBuckets: Int,
                   keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    dropTable(spark, table)
    df.repartition(bucketAlignedWidth(df, numBuckets), keys.map(df.col): _*)
      .write.format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** The same strict-width staging for APPENDS into an existing bucketed
    * table (each insertInto generation otherwise multiplies files the
    * same way). No-op for non-bucketed tables. */
  def alignedForInsert(df: DataFrame, table: String): DataFrame = {
    val spark = df.sparkSession
    spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec match {
      case Some(spec) =>
        df.repartition(bucketAlignedWidth(df, spec.numBuckets),
          spec.bucketColumnNames.map(df.col): _*)
      case None => df
    }
  }
}
