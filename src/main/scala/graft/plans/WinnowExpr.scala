package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `winnow_fps(text, k, w)` → array<bigint>: distinct winnowing
  * fingerprints over a rolling polynomial hash
  * ([[graft.functions.WinnowHash]]) — one O(n) pass per document
  * inside WholeStageCodegen. The expression-DSL flavor
  * ([[graft.operators.Winnow.fingerprints]]) pays one md5 per
  * character position through higher-order-function plumbing; this is
  * the production kernel, the md5 flavor is the DuckDB-oracle twin
  * (`dedup_substring` vs `dedup_substring_fast`).
  *
  * k and w are plan-time constants (literal-folded at registration) —
  * a data-dependent window width has no meaning for an index whose
  * fingerprints must be comparable across documents.
  */
case class WinnowFpsExpr(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_fps expects string, got ${child.dataType.catalogString}")
    else if (k < 2 || w < 1)
      TypeCheckResult.TypeCheckFailure(s"winnow_fps needs k >= 2, w >= 1; got k=$k w=$w")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(s: Any): Any =
    new GenericArrayData(graft.functions.WinnowHash.fingerprints(
      s.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowHash.fingerprints($s.toString(), $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFpsExpr =
    copy(child = newChild)
}
