package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out helpers for the reference's banded LSH blocking-join pattern
  * (/root/reference/README.md:133-164). The README idiom is one join per
  * seed + UNION; at scale the right shape is: posexplode the band array once,
  * shuffle once on (band, hash), and join — one shuffle covers all bands
  * (SURVEY.md §7.4).
  */
object BandedLsh {

  /** Explode `lsh_min(textCol, ...)` into (band, hash) rows keyed by `idCol`.
    * Rows whose text is shorter than `ngramWidth` hash identically everywhere
    * (empty shingle set, SURVEY.md §2.2.4) and are dropped up front — they
    * would otherwise form one catastrophic bucket. */
  def bandedRows(df: DataFrame, idCol: String, textCol: String,
                 ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long): DataFrame = {
    df.filter(length(col(textCol)) >= ngramWidth)
      .select(col(idCol), col(textCol),
        posexplode(graft.functions.lsh_min(col(textCol), ngramWidth, bandCount, bandSize, seed)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Distinct candidate id pairs (id_a < id_b) that collide in at least one
    * band — the blocking stage of a self near-dup join. Only ids flow through
    * the band join and the distinct: shuffling and deduplicating (id, id)
    * longs is cheap where dragging the full documents through would move the
    * whole corpus per band; texts are re-attached afterwards by two id joins. */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long): DataFrame = {
    val banded = bandedRows(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .select(col(idCol), col("band"), col("band_hash"))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_hash"))
    val idPairs = a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    idPairs
      .join(df.select(col(idCol).as("id_a"), col(textCol).as("text_a")), "id_a")
      .join(df.select(col(idCol).as("id_b"), col(textCol).as("text_b")), "id_b")
      .select("id_a", "id_b", "text_a", "text_b")
  }

  /** Full near-dup pair mining: banded blocking + exact-Jaccard verification.
    * Returns (id_a, id_b, sim) with sim > threshold. */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   ngramWidth: Int, bandCount: Int, bandSize: Int, seed: Long,
                   threshold: Double): DataFrame = {
    candidatePairs(df, idCol, textCol, ngramWidth, bandCount, bandSize, seed)
      .withColumn("sim", graft.functions.lsh_jaccard(col("text_a"), col("text_b"), ngramWidth))
      .filter(col("sim") > threshold)
      .select("id_a", "id_b", "sim")
  }

  /** Greedy duplicate-cluster assignment: every id maps to the smallest id it
    * is (transitively, via iterated min-propagation) connected to in the
    * near-dup pair graph. `maxIters` bounds the hash-min iterations — each
    * iteration is one shuffle; chains longer than 2^maxIters collapse is
    * rare in dedup graphs. */
  def dupClusters(pairs: DataFrame, maxIters: Int = 10): DataFrame = {
    // undirected edges as (node, neighbor-min candidate)
    var labels = pairs.select(col("id_a").as("id"), col("id_b").as("peer"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("peer")))
      .groupBy("id").agg(least(min(col("peer")), col("id")).as("cluster"))
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val next = labels.as("l")
        .join(labels.select(col("id").as("cid"), col("cluster").as("ccluster")).as("r"),
          col("l.cluster") === col("cid"), "left")
        .select(col("id"), least(col("cluster"), coalesce(col("ccluster"), col("cluster"))).as("cluster"))
      // convergence check costs an action; bound it to small graphs per call
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }
}
