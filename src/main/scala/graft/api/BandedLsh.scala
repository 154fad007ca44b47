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
    * is (transitively) connected to in the near-dup pair graph.
    *
    * Adaptive execution: dedup graphs are usually tiny relative to the corpus
    * (edges only between near-dups), so when the edge count is below
    * `driverThreshold` the components are computed with a driver-side
    * union-find — one collect, exact, no iteration. Larger graphs fall back
    * to distributed hash-min iteration (`maxIters` rounds, one shuffle each,
    * lineage truncated per round). */
  def dupClusters(pairs: DataFrame, maxIters: Int = 10,
                  driverThreshold: Long = 1000000L): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .localCheckpoint(true)
    if (edges.count() <= driverThreshold) {
      val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      import spark.implicits._
      return nodes.map(n => (n, find(n))).toSeq.toDF("id", "cluster")
    }
    distributedClusters(edges, maxIters)
  }

  private def distributedClusters(pairs: DataFrame, maxIters: Int): DataFrame = {
    // undirected edges as (node, neighbor-min candidate)
    // localCheckpoint each round: iterative self-joins otherwise double the
    // lineage per iteration and recompute the whole prefix every action
    var labels = pairs.select(col("id_a").as("id"), col("id_b").as("peer"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("peer")))
      .groupBy("id").agg(least(min(col("peer")), col("id")).as("cluster"))
      .localCheckpoint(true)
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val next = labels.as("l")
        .join(labels.select(col("id").as("cid"), col("cluster").as("ccluster")).as("r"),
          col("l.cluster") === col("cid"), "left")
        .select(col("id"), least(col("cluster"), coalesce(col("ccluster"), col("cluster"))).as("cluster"))
        .localCheckpoint(true)
      val changed = next.as("n").join(labels.as("o"), "id")
        .filter(col("n.cluster") =!= col("o.cluster")).limit(1).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels
  }
}
