package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k as a MERGEABLE aggregate — the scale form of
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC) <= k`.
  *
  * The window form cannot pre-aggregate: every row must reach its
  * group's reducer and be sorted there, so a 100-TB "top 3 titles per
  * market" shuffles 100 TB to rank rows of which all but k·|groups|
  * are discarded. A k-bounded heap IS a mergeable monoid, so as an
  * aggregate buffer it rides Spark's ordinary partial-aggregation
  * machinery: each map task keeps at most k (score, id) pairs per
  * group, the shuffle carries only those, and the reducer merges
  * heaps. Same result, shuffle bytes collapse from |rows| to
  * k·|groups|·|tasks| — this is why every warehouse ships a TOP_K /
  * MAX_BY(x, y, k) aggregate alongside window ranking.
  *
  * `topk_by(score DOUBLE, id BIGINT, k INT-literal)` returns
  * `array<struct<score double, id bigint>>`, best-first, ordered by
  * (score DESC, id ASC) — the id tiebreak makes results deterministic
  * and lets an exact window-ranking oracle verify the operator. Null
  * score or id rows are skipped (window ranking over NULLS LAST
  * semantics for the returned prefix, provided k rows have non-null
  * scores). NaN scores follow Double.compare (NaN sorts above +Inf,
  * matching Spark's DESC ordering of double).
  */
case class TopKByAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with TernaryLike[Expression] {

  override def prettyName: String = "topk_by"
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by requires a DOUBLE score, got ${first.dataType.sql} (cast explicitly)")
    else if (second.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"topk_by requires a BIGINT id, got ${second.dataType.sql}")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure("topk_by requires a literal INT k")
    else if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"topk_by requires k > 0, got $k")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val k: Int = third.eval().asInstanceOf[Int]

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = first.eval(input)
    val id = second.eval(input)
    if (s != null && id != null)
      buffer.offer(s.asInstanceOf[Double], id.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other); buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedBestFirst.map { case (s, id) =>
      InternalRow(s, id)
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKByAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** k-bounded worst-at-head heap of (score, id) pairs. "Better" =
  * higher score, then LOWER id (the deterministic tiebreak). Size
  * never exceeds k, so a buffer is O(k) in memory and on the wire
  * regardless of input rows. */
final class TopKBuffer(val k: Int) {

  // head = the WORST retained pair (PriorityQueue dequeues the max of
  // its ordering, so "worse" compares greater), giving O(log k) evict
  private[plans] val heap = mutable.PriorityQueue.empty[(Double, Long)](
    new Ordering[(Double, Long)] {
      def compare(a: (Double, Long), b: (Double, Long)): Int = {
        val c = java.lang.Double.compare(b._1, a._1) // lower score = worse
        if (c != 0) c else java.lang.Long.compare(a._2, b._2) // higher id = worse
      }
    })

  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  def offer(score: Double, id: Long): Unit = {
    if (heap.size < k) heap.enqueue((score, id))
    else if (better((score, id), heap.head)) {
      heap.dequeue()
      heap.enqueue((score, id))
    }
  }

  def mergeIn(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, id) => offer(s, id) }

  /** (score DESC, id ASC) — the oracle's ORDER BY. */
  def sortedBestFirst: Array[(Double, Long)] =
    heap.toArray.sortWith(better)

  def toBytes: Array[Byte] = {
    val arr = heap.toArray
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * arr.length)
    bb.putInt(k).putInt(arr.length)
    arr.foreach { case (s, id) => bb.putDouble(s).putLong(id) }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    var n = bb.getInt()
    while (n > 0) { buf.offer(bb.getDouble(), bb.getLong()); n -= 1 }
    buf
  }
}
