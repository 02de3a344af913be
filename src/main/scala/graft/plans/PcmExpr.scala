package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType, StructField, StructType}

/** `pcm_frames(bin, frameSamples)` →
  * `array<struct<energy: bigint, peak: int>>`: per-frame energy / peak
  * over a little-endian signed-int16 PCM payload
  * ([[graft.functions.PcmAudio.frames]]) — one O(n) byte pass per row
  * inside WholeStageCodegen, the `byte[]` untouched end to end. This
  * is the audio leg of the G2 decode pipeline: container metadata
  * comes from the fixed-offset header parsers
  * ([[graft.functions.Multimodal.wavFormat]]); the payload loop is a
  * genuine byte-scan the built-in expression surface cannot write
  * (same argument as [[JpegDimsExpr]]).
  *
  * `frameSamples` is a plan-time constant — frame statistics are only
  * comparable across rows under ONE framing, exactly the winnow_fps
  * (k, w) argument.
  */
case class PcmFramesExpr(child: Expression, frameSamples: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"pcm_frames expects binary, got ${child.dataType.catalogString}")
    else if (frameSamples < 1)
      TypeCheckResult.TypeCheckFailure(
        s"pcm_frames needs frameSamples >= 1, got $frameSamples")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("energy", LongType, nullable = false),
      StructField("peak", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "pcm_frames"

  override protected def nullSafeEval(b: Any): Any =
    graft.functions.PcmAudio.frames(b.asInstanceOf[Array[Byte]], frameSamples)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.PcmAudio.frames($b, $frameSamples);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PcmFramesExpr =
    copy(child = newChild)
}
