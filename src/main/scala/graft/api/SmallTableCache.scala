package graft.api

import org.apache.spark.sql.SparkSession

/** Driver-side cache for SMALL persisted state tables (the day-2 meta
  * map, the frozen BPE vocabulary) whose every read otherwise costs a
  * full Spark job (parquet listing + footer reads + collect) — on the
  * composed lifecycle operators those reads sit on the driver's critical
  * path once per micro-batch (guide §5: the driver should do almost no
  * data work, and a collect of 10 rows is priced like one of 10 million).
  *
  * NEVER a freshness assumption: every access re-validates against the
  * table's FILE LISTING (location + every file's name and length). Any
  * commit Spark can make changes that listing — part files are uniquely
  * named, overwrites recreate the directory, drops remove it — so an
  * unchanged fingerprint implies bit-identical table contents, including
  * for writers that bypass the owning operator entirely (the
  * torn-state spec appends a marker row straight into the meta table;
  * the fingerprint catches it where an invalidate-on-write protocol
  * could not). A changed fingerprint refreshes the relation cache and
  * re-reads through Spark, exactly as the uncached code did.
  *
  * This is metadata/state caching WITHIN one JVM, not result caching
  * across runs: every bench/verify invocation rebuilds these tables
  * (new files → new fingerprints → fresh reads), and the cached value is
  * always a pure function of the table's current bytes.
  *
  * The fingerprint is listed BEFORE the read: if a concurrent writer
  * lands in between, the stored (stale fingerprint, fresh value) pair
  * fails the next validation and re-reads — the safe direction. */
private[graft] object SmallTableCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Any)]()

  private def location(spark: SparkSession, table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location)

  /** `<location>|name:len,name:len,...` over every file under the table's
    * directory (sorted — listing order is not stable across filesystems). */
  private def fingerprint(spark: SparkSession, table: String): String = {
    val loc = location(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(loc, true)
    while (it.hasNext) {
      val f = it.next()
      entries += s"${f.getPath.getName}:${f.getLen}"
    }
    entries.sorted.mkString(s"$loc|", ",", "")
  }

  /** The value of `read` (a pure function of `table`'s bytes), served from
    * the cache when the table's file listing is unchanged since the value
    * was computed. `tag` namespaces different derivations of one table. */
  def cached[T](spark: SparkSession, table: String, tag: String)(read: => T): T = {
    val fp = fingerprint(spark, table)
    val key = s"$tag::${location(spark, table)}"
    Option(cache.get(key)) match {
      case Some((oldFp, v)) if oldFp == fp => v.asInstanceOf[T]
      case _ =>
        // no refreshTable here: the miss path must read EXACTLY as the
        // uncached code did (callers already refresh cloned-session
        // relation caches where that matters, and a refresh from in here
        // would uncache dependent cached plans — the DROP-PARTITION trap
        // the append paths pin against)
        val v = read
        cache.put(key, (fp, v))
        v
    }
  }

  /** Seed the cache after a write THIS caller just committed, so the next
    * read skips the Spark job: `value` must be exactly what `cached`'s
    * `read` would derive from the table's current bytes. */
  def put[T](spark: SparkSession, table: String, tag: String, value: T): Unit = {
    val key = s"$tag::${location(spark, table)}"
    cache.put(key, (fingerprint(spark, table), value))
  }
}
