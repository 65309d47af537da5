package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** 64-bit perceptual average-hash of a BMP `binary` column
  * ([[graft.operators.MediaCodecs.aHash64]]) as a codegen'd projection —
  * the multimodal decode stays a per-row kernel inside whole-stage
  * codegen (payload bytes never leave the scan stage; only the 8-byte
  * hash moves downstream into the Hamming-blocking join). Null for
  * malformed/undersized images, mirroring the decoder's per-row
  * barrier. */
case class ImageAHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_ahash"

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.MediaCodecs.aHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("ahash")
      s"""
        java.lang.Long $tmp = graft.operators.MediaCodecs.aHash64($v);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ImageAHashExpr =
    copy(child = newChild)
}

/** 64-bit perceptual energy-envelope hash of a PCM16 WAV `binary` column
  * ([[graft.operators.MediaCodecs.audioHash64]]) — the audio sibling of
  * [[ImageAHashExpr]], same codegen'd per-row decode+hash shape. */
case class AudioHashExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary input, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "audio_hash"

  override protected def nullSafeEval(input: Any): Any =
    graft.operators.MediaCodecs.audioHash64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val tmp = ctx.freshName("ahash")
      s"""
        java.lang.Long $tmp = graft.operators.MediaCodecs.audioHash64($v);
        if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): AudioHashExpr =
    copy(child = newChild)
}
