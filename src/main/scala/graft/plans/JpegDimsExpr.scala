package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native expression for JPEG dimension decode: the SOF byte-scan
  * ([[graft.functions.JpegDecode.dims]]) runs as one static call
  * inside WholeStageCodegen — no boxing, no UDF serialization, and
  * the binary value stays a `byte[]` end to end. Returns the packed
  * `(width << 32) | height` long, NULL for non-JPEG payloads;
  * [[graft.functions.Multimodal.jpegDims]] unpacks to a struct.
  *
  * Variable-position header walks can't be written with fixed-offset
  * substring arithmetic (the PNG/GIF/WAV route), which is exactly the
  * custom-Expression case: a scalar byte-loop the built-in surface
  * cannot express.
  */
case class JpegDimsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims expects binary, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims"

  override protected def nullSafeEval(b: Any): Any = {
    val v = graft.functions.JpegDecode.dims(b.asInstanceOf[Array[Byte]])
    if (v < 0L) null else v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      s"""
         |${ev.value} = graft.functions.JpegDecode.dims($b);
         |if (${ev.value} < 0L) ${ev.isNull} = true;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDimsExpr =
    copy(child = newChild)
}
