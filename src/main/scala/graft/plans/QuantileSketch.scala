package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

import org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile.PercentileDigest

/** Snowflake's APPROX_PERCENTILE_ACCUMULATE / COMBINE / ESTIMATE trio
  * — the PERSISTABLE quantile-sketch workflow (store per-day sketches
  * once; answer any later percentile question over any day range from
  * the sketches alone) — built on Spark's own Greenwald-Khanna digest
  * (the machinery inside percentile_approx, which Spark exposes only
  * as a one-shot aggregate). Same pattern as the HLL and bitmap
  * families: fold → binary column → merge aggregate → scalar probe.
  *
  *  - `qsketch_agg(x)`        ACCUMULATE: doubles → serialized digest
  *  - `qsketch_combine(bin)`  COMBINE: serialized digests → merged digest
  *  - `qsketch_estimate(bin, p)`  ESTIMATE: digest → approx p-quantile
  *
  * GK guarantees rank error ≤ ε·n (ε = 1/10000 here, percentile_approx's
  * default); merge preserves the bound. SketchSpec pins the rank error
  * of both direct and daily-merged sketches against exact percentiles.
  */
case class QSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest] with UnaryLike[Expression] {

  override def prettyName: String = "qsketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsketch_agg requires DOUBLE, got ${child.dataType.sql} (cast explicitly)")

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY)

  override def update(buffer: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: PercentileDigest, other: PercentileDigest): PercentileDigest = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buffer)
  override def serialize(buffer: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QSketchAgg =
    copy(child = newChild)
}

/** Merge of serialized digests (APPROX_PERCENTILE_COMBINE). */
case class QSketchCombine(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PercentileDigest] with UnaryLike[Expression] {

  override def prettyName: String = "qsketch_combine"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsketch_combine requires BINARY digests, got ${child.dataType.sql}")

  override def createAggregationBuffer(): PercentileDigest =
    new PercentileDigest(1.0 / ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY)

  override def update(buffer: PercentileDigest, input: InternalRow): PercentileDigest = {
    val v = child.eval(input)
    if (v != null) buffer.merge(
      ApproximatePercentile.serializer.deserialize(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: PercentileDigest, other: PercentileDigest): PercentileDigest = {
    buffer.merge(other); buffer
  }
  override def eval(buffer: PercentileDigest): Any =
    ApproximatePercentile.serializer.serialize(buffer)
  override def serialize(buffer: PercentileDigest): Array[Byte] =
    ApproximatePercentile.serializer.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): PercentileDigest =
    ApproximatePercentile.serializer.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): QSketchCombine =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QSketchCombine =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QSketchCombine =
    copy(child = newChild)
}

/** Approx quantile read off a serialized digest
  * (APPROX_PERCENTILE_ESTIMATE). Null for an empty digest. */
case class QSketchEstimate(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "qsketch_estimate"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qsketch_estimate requires (BINARY, DOUBLE), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    QSketchEstimate.estimate(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // freshName, not a literal: two estimates in one codegen function
    // (p50 + p95 in one projection) would redefine the local and janino
    // would reject the WHOLE stage → silent interpreted fallback
    val res = ctx.freshName("qest")
    nullSafeCodeGen(ctx, ev, (b, p) => s"""
      |java.lang.Double $res = graft.plans.QSketchEstimate.estimate($b, $p);
      |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.doubleValue(); }
    """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QSketchEstimate =
    copy(left = newLeft, right = newRight)
}

object QSketchEstimate {
  def estimate(bytes: Array[Byte], p: Double): java.lang.Double = {
    val digest = ApproximatePercentile.serializer.deserialize(bytes)
    val res = digest.getPercentiles(Array(p))
    if (res.isEmpty) null else java.lang.Double.valueOf(res.head.asInstanceOf[Double])
  }
}
