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

  /** SimHash near-dup candidate pairs: 64-bit simhash split into `bands`
    * equal bit-chunks; two docs are candidates if any chunk matches exactly
    * (Hamming ≤ bands-1 guarantees a chunk match — standard pigeonhole
    * blocking), then verified with a full Hamming-distance threshold. */
  def simhashDupPairs(df: DataFrame, idCol: String, textCol: String,
                      bands: Int, maxHamming: Int): DataFrame = {
    val width = 64 / bands
    val sim = df.select(col(idCol).as("id"), col(textCol).as("text"),
      graft.functions.simhash64(col(textCol)).as("sh"))
    val banded = sim.select(col("id"), col("sh"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("sh"), b * width)
          .bitwiseAND(lit((1L << width) - 1))): _*)))
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
