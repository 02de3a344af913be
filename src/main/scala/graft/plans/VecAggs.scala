package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_sum(array<double>)` — element-wise vector sum aggregate.
  *
  * The primitive behind distributed centroid computation (k-means /
  * IVF / PQ codebook training): `groupBy(cell).agg(vec_sum(vec))`
  * shuffles ONE partial-sum row per (partition, cell) — map-side
  * combine over dense double arrays — where the posexplode
  * formulation (`explode → groupBy(cell, pos) → avg`) shuffles
  * n×d exploded rows before its partial aggregate even groups them.
  * At corpus scale the difference is the whole Lloyd-round cost.
  *
  * Null handling matches built-in sums: null input rows are skipped,
  * all-null groups yield null. Vectors in a group must share their
  * length (the dense-embedding contract); a mismatch throws rather
  * than silently truncating.
  */
case class VecSum(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_sum expects array<double>, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "vec_sum"

  override def createAggregationBuffer(): Array[Double] = null

  private def add(buf: Array[Double], xs: Array[Double]): Array[Double] =
    if (buf == null) xs
    else {
      require(buf.length == xs.length,
        s"vec_sum: vector length mismatch (${buf.length} vs ${xs.length})")
      var i = 0
      while (i < buf.length) { buf(i) += xs(i); i += 1 }
      buf
    }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf
    else add(buf, v.asInstanceOf[ArrayData].toDoubleArray())
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] =
    if (other == null) buf else add(buf, other)

  override def eval(buf: Array[Double]): Any =
    if (buf == null) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] =
    if (buf == null) Array.emptyByteArray
    else {
      val bb = ByteBuffer.allocate(8 * buf.length)
      bb.asDoubleBuffer().put(buf)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Double] =
    if (bytes.isEmpty) null
    else {
      val out = new Array[Double](bytes.length / 8)
      ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
      out
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecSum =
    copy(child = newChild)
}

/** `vec_argmax_dot(vec, mat, bias)` → 0-based index `i` maximizing
  * `vec·mat[i] + bias[i]` (first max wins ties — the smallest index).
  *
  * The quantizer-assignment kernel (FAISS's inner loop): with
  * `bias = −‖c‖²/2` it is L2 argmin, with `bias = 0` cosine argmax
  * over unit vectors. `mat`/`bias` are usually codebook LITERALS
  * (control-plane, like a partition predicate), so assignment and PQ
  * encoding become ONE codegen'd expression node per segment instead
  * of k unrolled dot/argmax column trees — the difference between a
  * plan Catalyst folds in milliseconds and one it re-optimizes for
  * seconds per Lloyd round.
  */
case class VecArgmaxDot(vec: Expression, mat: Expression, bias: Expression)
  extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}

  override def first: Expression = vec
  override def second: Expression = mat
  override def third: Expression = bias

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, mat.dataType, bias.dataType) match {
      case (ArrayType(DoubleType, _),
            ArrayType(ArrayType(DoubleType, _), _),
            ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "vec_argmax_dot expects (array<double>, array<array<double>>, " +
          s"array<double>), got (${a.catalogString}, ${b.catalogString}, " +
          s"${c.catalogString})")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_argmax_dot"

  override protected def nullSafeEval(v: Any, m: Any, b: Any): Any = {
    val xs = v.asInstanceOf[ArrayData]
    val rows = m.asInstanceOf[ArrayData]
    val bs = b.asInstanceOf[ArrayData]
    val d = xs.numElements()
    var best = -1
    var bestScore = Double.NegativeInfinity
    var i = 0
    while (i < rows.numElements()) {
      val row = rows.getArray(i)
      var s = bs.getDouble(i)
      var j = 0
      while (j < d) { s += row.getDouble(j) * xs.getDouble(j); j += 1 }
      if (s > bestScore) { bestScore = s; best = i }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, m, b) => {
      val ad = classOf[ArrayData].getName
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val d = ctx.freshName("d"); val row = ctx.freshName("row")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestScore = ctx.freshName("bestScore")
      s"""
        |int $d = $v.numElements();
        |int $best = -1;
        |double $bestScore = Double.NEGATIVE_INFINITY;
        |for (int $i = 0; $i < $m.numElements(); $i++) {
        |  $ad $row = $m.getArray($i);
        |  double $s = $b.getDouble($i);
        |  for (int $j = 0; $j < $d; $j++) {
        |    $s += $row.getDouble($j) * $v.getDouble($j);
        |  }
        |  if ($s > $bestScore) { $bestScore = $s; $best = $i; }
        |}
        |${ev.value} = $best;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): VecArgmaxDot =
    copy(vec = newFirst, mat = newSecond, bias = newThird)
}
