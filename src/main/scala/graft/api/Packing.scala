package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the training-batch assignment step of
  * an LLM data pipeline: documents are laid end-to-end in the deterministic
  * [[Sampling.shuffleByHash]] order and cut into fixed `seqLen`-token
  * training sequences. Each document's global token offset decides the
  * chunk range it occupies.
  *
  * The prefix sum is the scale problem: `sum(tokens) OVER (ORDER BY ...)`
  * is a single-partition window — a non-starter on 10^10 documents. This
  * operator computes the SAME result with the classic two-level
  * decomposition:
  *
  *  1. bucket = floor(hashScore · buckets). The score is uniform in [0,1),
  *     so buckets are balanced; floor is monotone, so bucket order refines
  *     score order and concatenating buckets reproduces the global order
  *     exactly.
  *  2. within-bucket exclusive running sum — a `buckets`-way parallel
  *     window;
  *  3. bucket totals (tiny: `buckets` rows) get their own exclusive prefix
  *     sum on the driver-sized side and broadcast back as per-bucket
  *     offsets.
  *
  * One data shuffle (the bucket window), one broadcast. The result is
  * bit-identical to the global window for any bucket count (spec-pinned),
  * so `buckets` is purely a parallelism knob. Chunk ids use integer
  * division — exact at any corpus size (a double `floor` loses exactness
  * past 2^53 total tokens; 100 TB of text is ~10^13–10^14 tokens, close
  * enough to care).
  *
  * Zero-token rows are dropped: they occupy no space in the packed stream.
  * Output: `(id, tokens, token_offset, chunk_start, chunk_end)`.
  */
object Packing {

  def packSequences(df: DataFrame, idCol: String, tokensCol: Column,
                    seqLen: Int, seed: Long, buckets: Int = 1024): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    require(buckets > 0, "buckets must be positive")
    val score = Sampling.hashScore(col("id"), seed)
    val base = df
      .select(col(idCol).as("id"), tokensCol.cast("long").as("tokens"))
      .filter(col("tokens") > 0)
      .withColumn("bucket", floor(score * lit(buckets)).cast("int"))
      // no-op for non-null ids (a null id has no hash score and no place in
      // the packed order — dropped). Stated explicitly so BOTH branches
      // below carry the identical filter: the final join would otherwise
      // infer isnotnull(bucket) into just the streamed side, the subtrees
      // would differ, and AQE could not reuse the shuffle (second scan).
      .filter(col("bucket").isNotNull)
    // within-bucket exclusive prefix sum: buckets-way parallel window
    val wIn = Window.partitionBy("bucket")
      .orderBy(score.asc, col("id").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val inBucket = base.withColumn("bucket_run",
      coalesce(sum(col("tokens")).over(wIn), lit(0L)))
    // bucket totals DERIVED from the window output (last row's inclusive
    // sum = max(bucket_run + tokens)), not re-aggregated from `base`: the
    // totals branch then shares the window branch's shuffle stage
    // (ReuseExchange) and the whole operator reads the data ONCE — a
    // separate groupBy on `base` would rescan and re-tokenize the corpus.
    // The single-partition window here is over the `buckets` TOTALS rows,
    // never the data.
    val wB = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = inBucket
      .groupBy("bucket")
      .agg(max(col("bucket_run") + col("tokens")).as("btotal"))
      .withColumn("boffset", coalesce(sum(col("btotal")).over(wB), lit(0L)))
      .select("bucket", "boffset")
    inBucket.join(broadcast(offsets), "bucket")
      .withColumn("token_offset", col("boffset") + col("bucket_run"))
      .select(col("id"), col("tokens"), col("token_offset"),
        expr(s"CAST(token_offset div $seqLen AS BIGINT)").as("chunk_start"),
        expr(s"CAST((token_offset + tokens - 1) div $seqLen AS BIGINT)").as("chunk_end"))
  }
}
