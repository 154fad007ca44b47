package graft.api

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Table-layout maintenance: the small-files problem. Every incremental
  * pipeline (streaming foreachBatch sinks, per-batch appends, partitioned
  * writes with high-cardinality keys) accretes files far below the
  * row-group size parquet readers want; at 100 TB the driver then pays
  * per-file open/footer/list costs in the millions and scan tasks go
  * split-starved. Compaction rewrites a directory to size-targeted files;
  * it is the maintenance job you schedule alongside
  * [[BandedLsh.signatureIndexHealth]]-style drift scans.
  */
object Layout {

  /** Parquet file paths + total bytes under `path` (recursive, ignores
    * hidden/_SUCCESS entries). Driver-side listing — one RPC per directory
    * level, the same cost any planner pays to enumerate the table. */
  def describeFiles(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var files = 0L
    var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) {
        files += 1; bytes += f.getLen
      }
    }
    (files, bytes)
  }

  /** Rewrite the parquet directory at `inPath` to `outPath` as
    * ceil(totalBytes / targetBytes) files (at least 1). With `sortBy`
    * empty the shuffle is a plain round-robin repartition; with sort
    * columns it becomes a range partition + in-file sort, so compaction
    * doubles as (re-)clustering — compose with [[ZOrder.zvalue2]] to
    * restore curve locality that per-batch appends destroyed.
    *
    * Sizing note: `targetBytes` is compared against the INPUT's on-disk
    * bytes, so the output files land near the target only when input and
    * output compression ratios match (true for parquet→parquet rewrites
    * of the same data). One shuffle, cost proportional to the data
    * rewritten — schedule per partition/day, not per table. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long, sortBy: Seq[Column] = Nil): Long = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // in-place guard on FULLY-QUALIFIED paths: raw string equality lets
    // trailing slashes / relative-vs-absolute aliases through, and
    // mode("overwrite") would then delete the input before reading it
    val hconf = spark.sparkContext.hadoopConfiguration
    def qualified(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).makeQualified(hp)
    }
    require(qualified(outPath) != qualified(inPath),
      s"compact cannot overwrite its own input in place ($inPath resolves to ${qualified(inPath)})")
    val (files, bytes) = describeFiles(spark, inPath)
    // an empty directory would otherwise surface as spark.read's opaque
    // "unable to infer schema" — fail with the actual problem
    require(files > 0, s"no data files under $inPath — nothing to compact")
    val nFiles = math.min(Int.MaxValue.toLong,
      math.max(1L, (bytes + targetBytes - 1) / targetBytes)).toInt
    val df = spark.read.parquet(inPath)
    val shaped =
      if (sortBy.isEmpty) df.repartition(nFiles)
      else df.repartitionByRange(nFiles, sortBy: _*).sortWithinPartitions(sortBy: _*)
    shaped.write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
