package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StructField, StructType}

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

/** Struct-producing variant: `jpeg_dims_wh(bin)` →
  * `struct<width:int, height:int>` (NULL for non-JPEG). Unpacking the
  * packed long of [[JpegDimsExpr]] in the DSL referenced the call three
  * times (null guard + two fields), which outside whole-stage codegen's
  * subexpression elimination re-ran the SOF byte-scan up to 3× per row;
  * here the scan runs exactly once in every evaluation mode and the
  * struct is assembled from the single local. */
case class JpegDimsStructExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jpeg_dims_wh expects binary, got ${child.dataType.catalogString}")

  override def dataType: DataType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "jpeg_dims_wh"

  override protected def nullSafeEval(b: Any): Any = {
    val v = graft.functions.JpegDecode.dims(b.asInstanceOf[Array[Byte]])
    if (v < 0L) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((v >>> 32).toInt, (v & 0xffffffffL).toInt))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val packed = ctx.freshName("packed")
      val rowCls = classOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow].getName
      s"""
         |long $packed = graft.functions.JpegDecode.dims($b);
         |if ($packed < 0L) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new $rowCls(new Object[] {
         |    (int) ($packed >>> 32), (int) ($packed & 0xffffffffL) });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): JpegDimsStructExpr =
    copy(child = newChild)
}
