package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: `points.v ∈ [intervals.lo, intervals.hi)`.
  *
  * Spark plans the naive formulation (`ON v >= lo AND v < hi`) as a
  * broadcast-nested-loop — O(|points|·|intervals|). This implementation is
  * the bucketed shape: pick a bucket width, explode each interval over the
  * buckets it covers, bucket each point, equi-join on the bucket id, and
  * re-check the exact predicate. One hash join; work is
  * O(|points| + Σ interval_width/bucket_width + matches). The classic trick
  * for time-range and numeric-band joins at scale.
  */
object RangeJoin {

  /** @param points      DataFrame with a numeric `vCol`
    * @param intervals   DataFrame with numeric `loCol` (inclusive), `hiCol` (exclusive)
    * @param bucketWidth bucket granularity — near the typical interval width
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      vCol: String, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // interval [lo, hi) covers buckets floor(lo/w) .. ceil(hi/w)-1 — an
    // interval ending exactly on a bucket boundary does not reach into it
    val ivb = intervals.withColumn("__b",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        greatest(ceil(col(hiCol) / bucketWidth).cast("long") - 1,
          floor(col(loCol) / bucketWidth).cast("long")))))
    val ptb = points.withColumn("__b", floor(col(vCol) / bucketWidth).cast("long"))
    ptb.join(ivb, Seq("__b"))
      .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("__b")
  }
}
