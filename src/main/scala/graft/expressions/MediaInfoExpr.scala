package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.MediaHeader

/** `media_info(payload)` — probe a binary column's container header
  * ([[MediaHeader]]: PNG/JPEG/GIF + WAV + MP4) as a scalar SQL function
  * returning `struct<format, width, height, channels, sample_rate_hz,
  * duration_ms>`, or NULL for unrecognized payloads. The columnar twin of
  * the typed [[graft.operators.Multimodal.probeHeaders]] seam: fused into
  * the scan projection via `doGenCode`, it filters a media lake by
  * container properties (`WHERE media_info(payload).width >= 512`) without
  * leaving whole-stage codegen or materializing a typed Dataset.
  */
case class MediaInfoExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MediaInfoExpr.schema

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MediaInfoExpr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.MediaInfoExpr.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MediaInfoExpr =
    copy(child = newChild)

  override def prettyName: String = "media_info"
}

object MediaInfoExpr {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate_hz", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Shared by interpreted eval and codegen; null = not a recognized
    * container.
    */
  def compute(bytes: Array[Byte]): InternalRow =
    MediaHeader.parse(bytes) match {
      case Some(i) => InternalRow(UTF8String.fromString(i.format), i.width,
        i.height, i.channels, i.sampleRateHz, i.durationMs)
      case None => null
    }
}
