package graft.api

import org.apache.spark.sql.SparkSession

/** Small shared accessors for Spark runtime configuration. */
private[graft] object SparkEnv {

  /** `spark.sql.shuffle.partitions` as an Int, falling back to
    * `sparkContext.defaultParallelism` when the conf holds a non-numeric
    * value — deployments that set it to `"auto"` (or any vendor-specific
    * token) would otherwise throw NumberFormatException from every operator
    * that sizes a strict repartition off it. The fallback matches what such
    * deployments mean: "size shuffles to the cluster". */
  def shufflePartitions(spark: SparkSession): Int = {
    val raw = spark.conf.get("spark.sql.shuffle.partitions", "")
    raw.toIntOption.filter(_ > 0).getOrElse(spark.sparkContext.defaultParallelism)
  }
}
