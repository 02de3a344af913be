package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native int8 vector quantization for the ANN index memory layout
  * (IVF-Flat-Q8): `vec_q8(array<double>)` →
  * `struct<q: array<tinyint>, scale: double>` with symmetric per-vector
  * scale `max|x|/127`, and `vec_dot_q8(q8, q8)` → double (integer
  * multiply-accumulate, one rescale at the end — the inner sum is
  * exact; only the two scales carry quantization error).
  *
  * Native rather than HOF because the scale is a FULL PASS over the
  * vector that must happen before any element quantizes: a lambda
  * formulation re-evaluates the scale aggregate per element after
  * Catalyst inlines the alias (O(d²) per row); here both passes are
  * two primitive loops inside WholeStageCodegen.
  */
case class VecQuantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_q8 expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = VecQuantize.Q8Type
  override def nullable: Boolean = true // null element poisons the row
  override def prettyName: String = "vec_q8"

  override protected def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    var mx = 0.0
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i)) return null
      val v = math.abs(xs.getDouble(i))
      if (v > mx) mx = v
      i += 1
    }
    val scale = mx / 127.0
    val q = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        // round-half-up as floor(x + 0.5) — the STATED convention, so
        // the DuckDB oracle can restate it verbatim (Math.round
        // diverges from this at one pathological double near 0.5
        // since JDK-6430675; pinning the floor form removes the
        // engine-vs-oracle ambiguity)
        q(i) = math.floor(xs.getDouble(i) / scale + 0.5).toByte
        i += 1
      }
    }
    new GenericInternalRow(
      Array[Any](UnsafeArrayData.fromPrimitiveArray(q), scale))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val mx = ctx.freshName("mx")
      val sc = ctx.freshName("sc")
      val q = ctx.freshName("q")
      val rowCls = classOf[GenericInternalRow].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |double $mx = 0.0;
         |byte[] $q = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double v = Math.abs($a.getDouble($i));
         |  if (v > $mx) $mx = v;
         |}
         |if (!${ev.isNull}) {
         |  double $sc = $mx / 127.0;
         |  if ($sc != 0.0) {
         |    for (int $i = 0; $i < $n; $i++) {
         |      // floor(x + 0.5): same round-half-up convention as eval
         |      $q[$i] = (byte) Math.floor($a.getDouble($i) / $sc + 0.5);
         |    }
         |  }
         |  ${ev.value} = new $rowCls(new Object[] {
         |    $uad.fromPrimitiveArray($q), (Double) $sc });
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): VecQuantize =
    copy(child = newChild)
}

object VecQuantize {
  val Q8Type: StructType = StructType(Seq(
    StructField("q", ArrayType(ByteType, containsNull = false), nullable = false),
    StructField("scale", DoubleType, nullable = false)))
}

case class VecDotQ8(left: Expression, right: Expression)
    extends BinaryExpression {

  private def ok(t: DataType): Boolean = t match {
    case StructType(Array(
      StructField(_, ArrayType(ByteType, _), _, _),
      StructField(_, DoubleType, _, _))) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_q8 expects two struct<q: array<tinyint>, scale: double> " +
        s"arguments, got ${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // length mismatch → NULL (mirrors vec_dot)
  override def prettyName: String = "vec_dot_q8"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ra = a.asInstanceOf[InternalRow]
    val rb = b.asInstanceOf[InternalRow]
    val qa = ra.getArray(0)
    val qb = rb.getArray(0)
    val n = qa.numElements()
    if (qb.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += qa.getByte(i).toLong * qb.getByte(i).toLong
      i += 1
    }
    ra.getDouble(1) * rb.getDouble(1) * acc.toDouble
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val ad = classOf[ArrayData].getName
      s"""
         |$ad $qa = $a.getArray(0);
         |$ad $qb = $b.getArray(0);
         |int $n = $qa.numElements();
         |if ($qb.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (long) $qa.getByte($i) * (long) $qb.getByte($i);
         |  }
         |  ${ev.value} = $a.getDouble(1) * $b.getDouble(1) * (double) $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotQ8 =
    copy(left = newLeft, right = newRight)
}
