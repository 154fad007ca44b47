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
