package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs (one JVM-wide session, scalatest runs
  * suites sequentially in the forked JVM).
  *
  * Functions come in via `spark.sql.extensions=graft.sql.GraftExtensions` —
  * NOT via LshFunctions.register — so the entire suite exercises the
  * cluster-installation path (a static conf: it must be on the context
  * creator's builder; GraftExtensionsSpec checks a second session inherits
  * it). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("java.io.tmpdir")}/graft-warehouse-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
