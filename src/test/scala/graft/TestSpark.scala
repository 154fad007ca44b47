package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for specs (one JVM-wide session, scalatest runs
  * suites sequentially in the forked JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sql.LshFunctions.register(s)
    s
  }
}
