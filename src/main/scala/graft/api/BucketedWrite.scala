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

  def saveBucketed(df: DataFrame, table: String, numBuckets: Int,
                   keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    dropTable(spark, table)
    df.write.format("parquet")
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
