package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRUE cross-JVM staged-resume proof — a dev tool (like [[ScaleBench]],
  * not part of the driver contract) that splits one
  * [[graft.api.StagedPipeline]] run across two REAL JVM lifetimes:
  *
  *   runMain graft.XSessionResume commit   # JVM 1: commit stages 0-1,
  *                                         #   tamper s1, exit (the
  *                                         #   in-memory catalog dies
  *                                         #   with the process)
  *   runMain graft.XSessionResume resume   # JVM 2: fresh catalog —
  *                                         #   recovery must come from
  *                                         #   the warehouse directory
  *                                         #   listing alone
  *
  * The driver gate (`curate_corpus_staged_xsession`) and spec simulate
  * the restart in-process via [[org.apache.spark.sql.graft.CatalogOps]];
  * this main removes the simulation: JVM 2 genuinely starts with zero
  * registrations. The stage-1 TAMPER in JVM 1 (id 0 deleted from the
  * committed table after its commit) is the no-recompute probe — if
  * JVM 2 silently recomputed stages 0-1 from the input instead of
  * reading the recovered table, id 0 would reappear and the final
  * assertion fails. Prints one machine-checkable line:
  * `XSESSION <phase> OK ...`. */
object XSessionResume {

  private val Prefix = "graft_xjvm"

  private def stages: Seq[(String, DataFrame => DataFrame)] = Seq(
    "square" -> (d => d.withColumn("v", col("v") * col("v"))),
    "filter_even" -> (d => d.filter(col("id") % 2 === 0)),
    "plus_one" -> (d => d.withColumn("v", col("v") + 1L)),
    "total" -> (d => d.groupBy(col("v")).agg(count(lit(1)).as("n"))))

  private def input(spark: SparkSession): DataFrame =
    spark.range(100).select(col("id"), (col("id") % 10).as("v"))

  def main(args: Array[String]): Unit = {
    val phase = args.headOption.getOrElse(
      sys.error("usage: XSessionResume commit|resume"))
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse-xsession")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    phase match {
      case "commit" =>
        graft.api.StagedPipeline.reset(spark, Prefix)
        graft.api.StagedPipeline.run(input(spark), stages, Prefix,
          stopAfter = 2)
        // tamper the COMMITTED stage-1 table: the cross-JVM no-recompute
        // probe (resume must read this table, not re-derive it)
        val s1 = spark.table(s"${Prefix}_s1").filter(col("id") =!= 0L)
          .localCheckpoint(true)
        graft.api.BucketedWrite.dropTable(spark, s"${Prefix}_s1")
        s1.write.format("parquet").saveAsTable(s"${Prefix}_s1")
        val committed =
          graft.api.StagedPipeline.manifest(spark, Prefix).count()
        require(committed == 2, s"expected 2 committed stages, $committed")
        println(s"XSESSION commit OK stages=$committed (JVM exits; " +
          "in-memory catalog registrations die here)")

      case "resume" =>
        // a FRESH JVM: prove the catalog really is empty before recovery
        require(!spark.catalog.tableExists(s"${Prefix}_manifest"),
          "catalog not empty — this is not a fresh JVM")
        val recovered =
          graft.api.StagedPipeline.recoverFromWarehouse(spark, Prefix)
        require(recovered >= 3,
          s"expected >=3 tables recovered from the directory listing " +
            s"(manifest + s0 + s1), got $recovered")
        val fin = graft.api.StagedPipeline.run(input(spark), stages, Prefix)
          .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
        // expected: the unstaged chain over the TAMPERED input (id 0
        // removed) — valid because stages 0-1 are row-wise, so deleting
        // id 0 after stage 1 equals deleting it up front
        val want = stages.foldLeft(input(spark).filter(col("id") =!= 0L)) {
          case (d, (_, f)) => f(d) }
          .orderBy("v").collect().map(r => (r.getLong(0), r.getLong(1)))
        require(fin.toSeq == want.toSeq,
          s"cross-JVM resume diverged: ${fin.toSeq} vs ${want.toSeq}")
        graft.api.StagedPipeline.reset(spark, Prefix)
        println(s"XSESSION resume OK recovered=$recovered " +
          s"rows=${fin.length} (tamper visible => no recompute)")

      case other => sys.error(s"unknown phase '$other'")
    }
    spark.stop()
  }
}
