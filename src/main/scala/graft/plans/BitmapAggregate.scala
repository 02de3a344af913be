package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Growable uncompressed bitset keyed by non-negative long ids —
  * the aggregation buffer of [[BitmapDistinct]]. Grows by doubling to
  * the highest bit seen; serializes as (nWords, words…). For the
  * dense-id domains it targets (household/user surrogate keys) this
  * is ids/8 bytes per GROUP — a 10M-id domain is 1.25 MB, and the
  * map-side partial OR-merge means executors exchange one buffer per
  * (partition, group), never the ids. */
final class LongBitmap(var words: Array[Long]) {
  def this() = this(new Array[Long](4))

  def set(id: Long): Unit = {
    require(id >= 0, s"bitmap_distinct requires non-negative ids, got $id")
    // the bound must keep every derived quantity representable: the
    // word index an exact Int, the doubled growth positive, and the
    // serialized buffer length (4 + words*8) an Int. 2^33 ids ->
    // <= 2^27 words -> <= 1 GiB buffer; sparser/larger domains belong
    // to the HLL path.
    require(id < LongBitmap.MaxId,
      s"bitmap aggregate supports dense ids < 2^33, got $id — use hll_sketch_agg")
    val w = (id >>> 6).toInt
    if (w >= words.length) {
      // growth computed in Long and capped: Integer.highestOneBit*2
      // went negative for w >= 2^30
      val doubled = java.lang.Long.highestOneBit(w.toLong) * 2L
      val size = math.min(math.max(doubled, 4L), LongBitmap.MaxWords.toLong).toInt
      val grown = new Array[Long](size)
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }
    words(w) |= 1L << (id & 63)
  }

  def or(other: LongBitmap): LongBitmap = {
    if (other.words.length > words.length) {
      val grown = new Array[Long](other.words.length)
      System.arraycopy(words, 0, grown, 0, words.length)
      words = grown
    }
    var i = 0
    while (i < other.words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < words.length) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    n
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + words.length * 8)
    bb.putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }
}

object LongBitmap {
  /** Exclusive id bound: 2^33 dense ids = at most 2^27 words = a 1 GiB
    * buffer whose serialized length still fits an Int. */
  val MaxId: Long = 1L << 33
  private[plans] val MaxWords: Int = 1 << 27

  def fromBytes(bytes: Array[Byte]): LongBitmap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = bb.getLong; i += 1 }
    new LongBitmap(words)
  }
}

/** Exact intersection cardinality of two serialized bitmaps
  * ([[BitmapAgg]] outputs) — the set-algebra payoff of materialized
  * bitmaps: audience OVERLAP between any two segments is an AND over
  * two buffers, no scan, no join back to the fact table. A plain
  * binary expression (two bitmap columns in, BIGINT out); the word
  * loop is branch-free popcount. */
case class BitmapAndCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "bitmap_and_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_and_count requires two BINARY bitmaps, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BitmapAndCount.andCount(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.BitmapAndCount.andCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}

object BitmapAndCount {
  /** Static popcount-AND over two serialized bitmaps; called from both
    * interpreted eval and generated code. */
  def andCount(l: Array[Byte], r: Array[Byte]): Long = {
    val a = LongBitmap.fromBytes(l).words
    val b = LongBitmap.fromBytes(r).words
    val n = math.min(a.length, b.length)
    var i = 0
    var c = 0L
    while (i < n) { c += java.lang.Long.bitCount(a(i) & b(i)); i += 1 }
    c
  }
}

/** Union of two serialized bitmaps → serialized bitmap. With
  * [[BitmapAgg]] this is the incremental-maintenance primitive: OR a
  * micro-batch's bitmap into the stored one. OR is IDEMPOTENT and
  * commutative, so replayed batches converge without dedup state —
  * at-least-once delivery yields exactly-once reach by algebra. */
case class BitmapOr(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def prettyName: String = "bitmap_or"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_or requires two BINARY bitmaps, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    BitmapOr.or(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.BitmapOr.or($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapOr =
    copy(left = newLeft, right = newRight)
}

object BitmapOr {
  def or(l: Array[Byte], r: Array[Byte]): Array[Byte] =
    LongBitmap.fromBytes(l).or(LongBitmap.fromBytes(r)).toBytes
}

/** EXACT distinct counting as a mergeable partial aggregate — the
  * precise sibling of q_hll_reach's sketches, for id domains dense
  * enough to bitmap (surrogate-keyed households/users; the reference's
  * reach metric, etl-ddl-backfill.sql:188-218). COUNT(DISTINCT id)
  * cannot pre-aggregate (every id must cross the exchange);
  * `bitmap_distinct(id)` folds each map partition into a bitset and
  * merges by OR, so the shuffle carries one buffer per group per
  * partition and the result is still EXACT — which also makes it
  * oracle-checkable against DuckDB's COUNT(DISTINCT), unlike any
  * sketch. A custom [[TypedImperativeAggregate]]: the third Catalyst
  * extension kind in graft/plans (scalar Expression with codegen,
  * planner strategy + physical operator, and now a typed aggregate).
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_distinct requires BIGINT ids, got ${child.dataType.sql}")

  override def createAggregationBuffer(): LongBitmap = new LongBitmap()

  override def update(buffer: LongBitmap, input: InternalRow): LongBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.set(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: LongBitmap, other: LongBitmap): LongBitmap =
    buffer.or(other)

  override def eval(buffer: LongBitmap): Any = buffer.cardinality

  override def serialize(buffer: LongBitmap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): LongBitmap = LongBitmap.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapDistinct =
    copy(child = newChild)
}

/** [[BitmapDistinct]] that RETURNS the bitmap (binary) instead of its
  * cardinality — the materialization half of the rollup pair, exactly
  * as hll_sketch_agg is to hll_sketch_estimate: persist per-day
  * bitmaps once, answer any coarser distinct-count by OR-merging them
  * ([[BitmapOrCount]]) without rescanning events, and EXACTLY. */
case class BitmapAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_agg requires BIGINT ids, got ${child.dataType.sql}")
  override def createAggregationBuffer(): LongBitmap = new LongBitmap()
  override def update(buffer: LongBitmap, input: InternalRow): LongBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.set(v.asInstanceOf[Long])
    buffer
  }
  override def merge(buffer: LongBitmap, other: LongBitmap): LongBitmap = buffer.or(other)
  override def eval(buffer: LongBitmap): Any = buffer.toBytes
  override def serialize(buffer: LongBitmap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): LongBitmap = LongBitmap.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapAgg =
    copy(child = newChild)
}

/** OR-merge of serialized bitmaps ([[BitmapAgg]] outputs) → exact
  * distinct count of the union. */
case class BitmapOrCount(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LongBitmap] with UnaryLike[Expression] {

  override def prettyName: String = "bitmap_or_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_or_count requires BINARY bitmaps, got ${child.dataType.sql}")
  override def createAggregationBuffer(): LongBitmap = new LongBitmap()
  override def update(buffer: LongBitmap, input: InternalRow): LongBitmap = {
    val v = child.eval(input)
    if (v != null) buffer.or(LongBitmap.fromBytes(v.asInstanceOf[Array[Byte]]))
    buffer
  }
  override def merge(buffer: LongBitmap, other: LongBitmap): LongBitmap = buffer.or(other)
  override def eval(buffer: LongBitmap): Any = buffer.cardinality
  override def serialize(buffer: LongBitmap): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): LongBitmap = LongBitmap.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapOrCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapOrCount =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BitmapOrCount =
    copy(child = newChild)
}
