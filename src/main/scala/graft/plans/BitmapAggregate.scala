package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** CHUNKED exact bitset keyed by non-negative long ids — the
  * aggregation buffer of [[BitmapDistinct]] (the roaring-bitmap idea
  * with fixed dense containers). Ids partition into 64Ki-id chunks
  * (`id >>> 16`); only TOUCHED chunks allocate their 8 KiB word
  * array, held in a sorted map. Memory therefore tracks the id
  * CLUSTERS actually present, not the maximum id: a dense 10M-id
  * domain is ~1.25 MB (same as a flat bitset), and a sharded or
  * offset id space (surrogate blocks per region/tenant, the x10
  * sweep's replica layout) costs per-cluster, where the former flat
  * buffer sized itself by max-id and collapsed 38× on the sweep.
  * Serialization is (nChunks, [chunkId, 1024 words]*) in ascending
  * chunk order — byte-deterministic for a given id set, so OR-replay
  * produces identical bytes (the streaming sink's idempotence
  * contract). The map-side partial OR-merge still means executors
  * exchange one buffer per (partition, group), never the ids. */
final class LongBitmap(
    val chunks: java.util.TreeMap[java.lang.Long, Array[Long]]) {
  def this() = this(new java.util.TreeMap[java.lang.Long, Array[Long]]())

  import LongBitmap.{ChunkWords, MaxChunks}

  def set(id: Long): Unit = {
    require(id >= 0, s"bitmap_distinct requires non-negative ids, got $id")
    val key = java.lang.Long.valueOf(id >>> 16)
    var words = chunks.get(key)
    if (words == null) {
      require(chunks.size < MaxChunks,
        s"bitmap aggregate exceeded $MaxChunks chunks of 64Ki ids each " +
          "(2^33 dense ids, or as many distinct 64Ki-id clusters) — id " +
          "domain too sparse or too large, use hll_sketch_agg")
      words = new Array[Long](ChunkWords)
      chunks.put(key, words)
    }
    words(((id >>> 6) & (ChunkWords - 1)).toInt) |= 1L << (id & 63)
  }

  def or(other: LongBitmap): LongBitmap = {
    val it = other.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = chunks.get(e.getKey)
      if (mine == null) {
        require(chunks.size < MaxChunks,
          s"bitmap aggregate exceeded $MaxChunks chunks — use hll_sketch_agg")
        chunks.put(e.getKey, e.getValue.clone()) // never alias the other buffer
      } else {
        var i = 0
        val theirs = e.getValue
        while (i < ChunkWords) { mine(i) |= theirs(i); i += 1 }
      }
    }
    this
  }

  def cardinality: Long = {
    var n = 0L
    val it = chunks.values().iterator()
    while (it.hasNext) {
      val words = it.next()
      var i = 0
      while (i < ChunkWords) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + chunks.size * (8 + ChunkWords * 8))
    bb.putInt(LongBitmap.ChunkedMagic) // format tag: legacy flat had nWords >= 0 here
    bb.putInt(chunks.size)
    val it = chunks.entrySet().iterator() // TreeMap: ascending chunk id
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.getKey)
      val words = e.getValue
      var i = 0
      while (i < ChunkWords) { bb.putLong(words(i)); i += 1 }
    }
    bb.array()
  }
}

object LongBitmap {
  /** 1024 longs per chunk = 64Ki ids = 8 KiB. */
  private[plans] val ChunkWords: Int = 1 << 10
  /** Serialized bound stays ~1 GiB: 2^17 chunks covers 2^33 DENSE ids
    * (the former flat-bitset limit) or any sparser domain with up to
    * 131k distinct 64Ki-id clusters. */
  private[plans] val MaxChunks: Int = 1 << 17
  /** Header tag of the chunked format. The legacy flat format began
    * with its non-negative word count, so a negative tag is
    * unambiguous and old persisted buffers (H11 bitmap tables written
    * before the chunk change) still load via the legacy branch. */
  private[plans] val ChunkedMagic: Int = -2

  def fromBytes(bytes: Array[Byte]): LongBitmap = {
    val bb = ByteBuffer.wrap(bytes)
    val head = bb.getInt
    val m = new java.util.TreeMap[java.lang.Long, Array[Long]]()
    if (head == ChunkedMagic) {
      val n = bb.getInt
      var c = 0
      while (c < n) {
        val key = bb.getLong
        val words = new Array[Long](ChunkWords)
        var i = 0
        while (i < ChunkWords) { words(i) = bb.getLong; i += 1 }
        m.put(key, words)
        c += 1
      }
    } else {
      // legacy flat (nWords, words...) buffer: re-chunk it. head IS
      // the word count; flat word w covers ids [w*64, w*64+63] ->
      // chunk w >>> 10, offset w & 1023.
      require(head >= 0, s"corrupt bitmap buffer: header $head")
      var w = 0
      while (w < head) {
        val v = bb.getLong
        if (v != 0L) {
          val key = java.lang.Long.valueOf((w >>> 10).toLong)
          var words = m.get(key)
          if (words == null) { words = new Array[Long](ChunkWords); m.put(key, words) }
          words(w & (ChunkWords - 1)) = v
        }
        w += 1
      }
    }
    new LongBitmap(m)
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
    * interpreted eval and generated code. Only chunks PRESENT IN BOTH
    * contribute — the chunked layout makes disjoint id clusters free. */
  def andCount(l: Array[Byte], r: Array[Byte]): Long = {
    val a = LongBitmap.fromBytes(l).chunks
    val b = LongBitmap.fromBytes(r).chunks
    val (small, big) = if (a.size <= b.size) (a, b) else (b, a)
    var c = 0L
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = big.get(e.getKey)
      if (other != null) {
        val mine = e.getValue
        var i = 0
        while (i < mine.length) {
          c += java.lang.Long.bitCount(mine(i) & other(i)); i += 1
        }
      }
    }
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
