package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** The pluggable media-decoder seam. An implementation holds its expensive
  * native state (codec contexts, model weights) in `@transient lazy val`s:
  * the decoder object is serialized into the plan once, and each executor
  * JVM initializes the context lazily on first decode — the same per-JVM
  * lazy-init pattern as [[CentroidModel]]. Implementations must be
  * deterministic pure functions of the payload bytes, or results stop being
  * reproducible across retries/partitionings.
  */
trait MediaDecoder extends Serializable {
  /** (checksum, width, height, meanByte) of a decoded payload. */
  def decode(bytes: Array[Byte]): (Long, Int, Int, Double)
}

/** `decode_media(bytes)` → struct(checksum, width, height, mean_byte).
  *
  * Why an expression and not `rdd.mapPartitions`: the RDD path drops the
  * whole stage out of Tungsten — every payload pays
  * InternalRow→Row→InternalRow conversion plus the codegen break — while
  * this node evaluates inside WholeStageCodegen, reading the byte array
  * straight out of the scan's UnsafeRow. Downstream field accesses are
  * `GetStructField`s over ONE decode call per row (Catalyst subexpression
  * elimination dedupes the shared child in both codegen and interpreted
  * mode; equality holds because `decoder` is compared by `equals`).
  */
case class DecodeMedia(child: Expression, decoder: MediaDecoder)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def prettyName: String = "decode_media"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DecodeMedia.schema

  override protected def nullSafeEval(v: Any): Any =
    DecodeMedia.decodeToRow(decoder, v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dec = ctx.addReferenceObj("mediaDecoder", decoder, classOf[MediaDecoder].getName)
    val mod = s"${classOf[DecodeMedia].getName}$$.MODULE$$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $mod.decodeToRow($dec, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_dhash(bytes)` / `image_ahash(bytes)`: 64-bit perceptual hash
  * over the DECODED raster ([[graft.core.ImageHash]] states the
  * integer-exact gray/grid/floor-mean recipe, re-derivable from a pixel
  * recipe with no image libraries — which is how the gate pins it).
  * NULL payload, undecodable or over-`maxPixels` payloads, and rasters
  * narrower than the hash grid all → NULL (no hash is honest; a
  * sentinel hash would collide unrelated junk). CodegenFallback like
  * [[SimHash64]]: the ImageIO decode dominates per-row cost. */
case class ImageHash64(child: Expression, kind: String,
                       maxPixels: Long = 64L * 1024 * 1024)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(kind == "dhash" || kind == "ahash",
    s"kind must be 'dhash' or 'ahash', got '$kind'")
  require(maxPixels > 0, s"maxPixels must be positive, got $maxPixels")

  override def prettyName: String = s"image_$kind"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val img = _root_.graft.core.ImageHash
      .readImage(v.asInstanceOf[Array[Byte]], maxPixels)
    if (img == null) null
    else if (kind == "dhash") _root_.graft.core.ImageHash.dhash64(img)
    else _root_.graft.core.ImageHash.ahash64(img)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `image_resize(bytes, maxDim)`: integer-exact box-filter downscale of
  * the DECODED raster to aspect-preserved dims under `maxDim`
  * ([[graft.core.ImageHash.resizeBox]] states the floor-grid/floor-mean
  * recipe, re-derivable from a pixel recipe with no image libraries).
  * Output struct(width, height, out_w, out_h, pixels) — `pixels` is the
  * row-major RGB byte raster, the REAL thumbnail payload (an encoder is
  * a sink concern; training pipelines consume rasters). NULL payload,
  * undecodable or over-`maxPixels` payloads → NULL struct.
  * CodegenFallback like [[ImageHash64]]: decode dominates per-row cost. */
case class ImageResizeBox(child: Expression, maxDim: Int,
                          maxPixels: Long = 64L * 1024 * 1024)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(maxDim > 0, s"maxDim must be positive, got $maxDim")

  override def prettyName: String = "image_resize"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ImageResizeBox.schema
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any = {
    val img = _root_.graft.core.ImageHash
      .readImage(v.asInstanceOf[Array[Byte]], maxPixels)
    if (img == null) null
    else {
      val (ow, oh) = _root_.graft.core.ImageHash
        .fitDims(img.getWidth, img.getHeight, maxDim)
      val px = _root_.graft.core.ImageHash.resizeBox(img, ow, oh)
      if (px == null) null
      else new GenericInternalRow(Array[Any](
        img.getWidth, img.getHeight, ow, oh, px))
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ImageResizeBox {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("out_w", IntegerType, nullable = false),
    StructField("out_h", IntegerType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))
}

/** `audio_fp(bytes)`: 64-bit perceptual audio fingerprint over DECODED
  * PCM ([[graft.core.AudioFingerprint]] states the integer-exact
  * mono-sum/segment/sign-of-energy-delta recipe, re-derivable from a
  * sample recipe with no audio libraries — which is how the gate pins
  * it). NULL payload, undecodable / non-PCM-16 / over-`maxFrames`
  * payloads, and clips shorter than the 33-segment grid all → NULL (no
  * hash is honest; a sentinel hash would collide unrelated junk).
  * CodegenFallback like [[ImageHash64]]: the container decode dominates
  * per-row cost. */
case class AudioFp64(child: Expression, maxFrames: Long = 48000L * 3600)
    extends UnaryExpression with ImplicitCastInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(maxFrames > 0, s"maxFrames must be positive, got $maxFrames")

  override def prettyName: String = "audio_fp"
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    _root_.graft.core.AudioFingerprint
      .fingerprint(v.asInstanceOf[Array[Byte]], maxFrames)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DecodeMedia {
  val schema: StructType = StructType(Seq(
    StructField("checksum", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false)))

  /** Shared by interpreted eval and generated code (static call target). */
  def decodeToRow(decoder: MediaDecoder, bytes: Array[Byte]): InternalRow = {
    val (checksum, width, height, meanByte) = decoder.decode(bytes)
    new GenericInternalRow(Array[Any](checksum, width, height, meanByte))
  }
}
