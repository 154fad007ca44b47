package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (hash-groupBy), MinHash-banded (see
  * [[BandedLsh]]), SimHash (banded Hamming), n-gram Jaccard windowed (see
  * SparkEntry dedup_near_window), embedding-cosine (see
  * [[Ann.cosineNearDupWindow]]).
  */
object Dedup {

  /** Exact dedup on `keyCols` content: keeps the row with the smallest
    * `tieBreak` per duplicate group. One shuffle on the content hash. */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreak: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreak))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Survivor selection after near-dup clustering: one representative per
    * duplicate cluster, ranked by `rank` (e.g. longest text, best quality
    * score — ties MUST be broken by a unique column, normally the id, or
    * the survivor is partition-order-dependent). Rows absent from
    * `clusters` are singletons and survive unchanged. This is the step
    * that turns [[BandedLsh.dupClusters]]' labels into an actual
    * deduplicated corpus — "drop near-dups, keep the best copy".
    *
    * One shuffle on the cluster label; the per-group work is a top-1
    * row_number, so group size only bounds a streamed sort run, never
    * memory. Cluster labels cover only near-dup members (sparse), so the
    * left join is a broadcast in practice and the window's skew is capped
    * by the largest dup cluster — at 100 TB a mega-cluster means
    * boilerplate that upstream filters should have dropped, and its cost
    * here is one sorted scan, not a pair explosion.
    *
    * CONTRACT on `clusters`: every cluster label must itself be the id of a
    * member of that cluster (as [[BandedLsh.dupClusters]] guarantees —
    * labels are min member ids). Singletons are grouped under their own id
    * via `coalesce(cluster, id)`, so a label colliding with a NON-member
    * doc's id would silently pull that doc into the cluster's window and
    * can drop it. Arbitrary label schemes (uuids, dense ranks) violate this
    * only if a label equals some doc id; when in doubt, assert
    * `clusters.filter(col("id") === col("cluster"))` has one row per
    * distinct label before calling. */
  def keepBestPerCluster(docs: DataFrame, clusters: DataFrame, idCol: String,
                         rank: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(rank.nonEmpty, "rank must order survivors (last key should be unique)")
    val labeled = docs.join(
      clusters.select(col("id").as("__cid"), col("cluster").as("__cluster")),
      docs(idCol) === col("__cid"), "left")
    // singletons cluster with themselves
    val grouped = labeled.withColumn("__grp", coalesce(col("__cluster"), col(idCol)))
    val w = Window.partitionBy(col("__grp")).orderBy(rank: _*)
    grouped.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__grp", "__cid", "__cluster")
  }

  /** SimHash near-dup candidate pairs: 64-bit simhash split into `bands`
    * equal bit-chunks; two docs are candidates if any chunk matches exactly
    * (Hamming ≤ bands-1 guarantees a chunk match — standard pigeonhole
    * blocking), then verified with a full Hamming-distance threshold.
    *
    * `bands` need not divide 64: chunks are `64/bands` bits wide and the
    * top `64 mod bands` bits are simply not blocked on (e.g. bands=3 →
    * 3×21-bit chunks, top bit ignored). The pigeonhole recall guarantee is
    * unaffected — ≤ bands-1 differing bits among the covered bits still
    * forces a matching chunk, and differences confined to the ignored bits
    * only ADD candidates (which full-Hamming verification then filters). */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      bands: Int, maxHamming: Int): DataFrame = {
    require(bands >= 1 && bands <= 64, s"bands must be in [1, 64], got $bands")
    val sim = df.select(col(idCol).as("id"), col(textCol).as("text"),
      graft.functions.simhash64(col(textCol)).as("sh"))
    val banded = sim.select(col("id"), col("sh"),
      posexplode(SketchBlocking.chunks(col("sh"), bands, bands * (64 / bands))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("id").as("id_a"), col("sh").as("sh_a"), col("band"), col("chunk"))
    val b = banded.select(col("id").as("id_b"), col("sh").as("sh_b"), col("band"), col("chunk"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.functions.hamming_dist(col("sh_a"), col("sh_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
