package graft.api

import graft.core.FxHash

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media travel as opaque `binary` columns with a
  * typed metadata struct; decode/feature-extraction runs partition-batched so
  * a real decoder (image/audio libs are not in this container) drops into
  * [[decodeStub]] without touching schema, partitioning, or the driver.
  *
  * The stub "decoder" is deterministic: byte-level stats + an FxHash64
  * checksum + fake dimensions parsed from the first bytes, so tests and
  * oracles can pin outputs while the Spark-side shape (binary columns,
  * mapPartitions batching, per-partition decoder init, feature schema) is the
  * real production shape.
  */
object Multimodal {

  /** Schema of a media column: payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Extracted-feature schema. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = true),
    StructField("checksum", LongType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_byte", DoubleType, nullable = true)))

  /** Deterministic stand-in for a media decoder (??? in this container: no
    * codec libraries). A real implementation replaces only this function. */
  def decodeBytes(bytes: Array[Byte]): (Long, Int, Int, Double) = {
    var h = 0L
    var sum = 0L
    var i = 0
    while (i < bytes.length) {
      h = FxHash.add(h, bytes(i).toLong & 0xffL)
      sum += bytes(i).toLong & 0xffL
      i += 1
    }
    val width = if (bytes.length >= 2) ((bytes(0) & 0xff) << 8 | (bytes(1) & 0xff)) else 0
    val height = if (bytes.length >= 4) ((bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) else 0
    val mean = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length
    (h, width, height, mean)
  }

  /** Partition-batched feature extraction. The iterator shape mirrors what a
    * real decoder needs: per-partition init (codec contexts), streaming rows,
    * no per-row driver round trips. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) Row(id, null, null, null, null, null)
        else {
          val bytes = r.getAs[Array[Byte]](1)
          val (h, w, ht, mean) = decodeBytes(bytes)
          Row(id, bytes.length.toLong, h, w, ht, mean)
        }
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Resize/thumbnail stub: one partition-batched pass decodes (stub) each
    * payload, computes aspect-preserving target dims against `maxDim`
    * (integer arithmetic — reproducible anywhere), and emits a
    * deterministic fake thumbnail (the leading out_w-byte slice; a real
    * implementation replaces decodeBytes and the slice with codec calls,
    * the row shape and batching stay). Dims of 0 (payload too short for
    * the stub header) pass through with an empty thumb. */
  val resizeSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("out_w", IntegerType, nullable = true),
    StructField("out_h", IntegerType, nullable = true),
    StructField("thumb_bytes", BinaryType, nullable = true)))

  def resizeStub(media: DataFrame, maxDim: Int): DataFrame = {
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    val spark = media.sparkSession
    val rdd = media.select("media_id", "bytes").rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        if (r.isNullAt(1)) Row(id, null, null, null, null, null)
        else {
          val bytes = r.getAs[Array[Byte]](1)
          val (_, w, h, _) = decodeBytes(bytes)
          val (ow, oh) =
            if (w <= maxDim && h <= maxDim) (w, h)
            else if (w >= h) (maxDim, h * maxDim / w)
            else (w * maxDim / h, maxDim)
          Row(id, w, h, ow, oh, bytes.slice(0, math.min(ow, bytes.length)))
        }
      }
    }
    spark.createDataFrame(rdd, resizeSchema)
  }

  /** Frame sampling for a (fake) video payload: every `stride`-th 16-byte
    * block becomes one "frame" row — demonstrates the explode-with-ordinal
    * shape a real frame sampler produces. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    media.select(col("media_id"), col("bytes"),
        explode(sequence(lit(0L),
          floor((length(col("bytes")) - 1).cast("double") / (16 * stride)).cast("long"))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        substring(col("bytes"), (col("frame_idx") * (16 * stride) + 1).cast("int"), lit(16)).as("frame_bytes"))
  }
}
