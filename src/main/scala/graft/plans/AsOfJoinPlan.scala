package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Whole-operator Catalyst extension for the BROADCAST as-of join —
  * the (c) rung of the extension ladder (custom LogicalPlan +
  * SparkStrategy + SparkPlan) reserved for semantics the built-in
  * operators can't express efficiently.
  *
  * Why it exists when [[graft.operators.AsOfJoin.nearestBefore]]
  * already works: the union+window form must SHUFFLE the fact side on
  * the key to sort each group — one full exchange of the 100-TB side.
  * When the right side is dimension-sized (weight snapshots, panel
  * windows, rate cards — the reference's own as-of shapes,
  * etl-ddl-backfill.sql:60-77), the as-of is resolvable per fact ROW
  * against a broadcast index: zero exchange, zero sort on the fact
  * side, O(log W) binary-search probe per row, and the fact side's
  * partitioning/ordering survive for downstream stages (`.explain`
  * shows no Exchange above the scan). That plan is not expressible by
  * composing existing operators: a broadcast range join explodes
  * every fact row across all <= candidates before re-aggregating.
  *
  * Semantics match `nearestBefore`: greatest right time <= left time
  * per key; unmatched (or NULL key/time) left rows carry NULLs; right
  * rows with NULL key/time never match; the right side must be unique
  * per (key, time) — ties have no defined winner there.
  */
case class BroadcastAsOfJoin(
    leftKeys: Seq[Attribute],
    leftTime: Attribute,
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    carry: Seq[Attribute],
    forward: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ carry.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for graft's custom logical nodes; injected via
  * [[GraftExtensions]] (conf route) or `GraftExtensions.register`
  * (live-session route). */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: BroadcastAsOfJoin =>
      BroadcastAsOfJoinExec(j.leftKeys, j.leftTime, j.rightKeys, j.rightTime,
        j.carry.map(_.withNullability(true)), j.forward,
        planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}

/** Executor-side probe index for the codegen path: per-key
  * time-sorted carry rows behind a key map. Keys are boxed Longs or
  * UTF8Strings (both with value equals/hashCode); the generated call
  * site picks the overload matching the key's java type. Built
  * lazily once per codegen'd task from the broadcast array. */
final class AsOfProbeIndex(
    map: java.util.HashMap[AnyRef, (Array[Long], Array[UnsafeRow])],
    forward: Boolean) {
  /** Primitive-long entry point for LongType keys (boxes once per row,
    * same cost the HashMap lookup always paid). */
  def probe(key: Long, t: Long): UnsafeRow =
    probe(java.lang.Long.valueOf(key): AnyRef, t)

  /** Matched carry row or null — floor (backward) / ceiling (forward)
    * binary search over the key's sorted times. */
  def probe(key: AnyRef, t: Long): UnsafeRow = {
    val entry = map.get(key)
    if (entry == null) return null
    val times = entry._1
    var lo = 0
    var hi = times.length - 1
    var ans = -1
    if (forward) {
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) >= t) { ans = mid; hi = mid - 1 } else lo = mid + 1
      }
    } else {
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
      }
    }
    if (ans < 0) null else entry._2(ans)
  }
}

/** Executor-level cache of built probe indexes, keyed by
  * (application, broadcast id, operator fingerprint). The broadcast
  * ships ROWS (IdentityBroadcastMode); without this cache every TASK
  * re-built its own index — at 32 cores over a million-row right side
  * that is 32× the build CPU and, worse, 32× the heap (the x10 scale
  * sweep measured q_asof_native collapsing into GC exactly this way).
  * One build per executor, concurrent probers share the read-only
  * index — the same discipline Spark's own HashedRelation broadcast
  * follows. SoftReferences let the executor drop an index under
  * memory pressure; the next task rebuilds. */
object AsOfIndexCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    (String, Long, AnyRef), java.lang.ref.SoftReference[AnyRef]]()

  /** `recipe` must be an equals-comparable description of the FULL
    * operator configuration (key/time/carry expr ids, direction, key
    * mode) — under ReuseExchange two different as-of operators can
    * legally share one broadcast id, and only recipe EQUALITY (not a
    * 32-bit hash) guarantees they never serve each other's index. */
  def getOrBuild[T <: AnyRef](bcId: Long, recipe: AnyRef, build: () => T): T = {
    // app id scopes entries so broadcast ids from a restarted context
    // can't collide with a predecessor's (absent env = bare JVM tests)
    val appId = Option(org.apache.spark.SparkEnv.get)
      .map(_.conf.getAppId).getOrElse("no-app")
    val key = (appId, bcId, recipe)
    var result: AnyRef = null
    while (result == null) {
      // computeIfAbsent serializes builders of the SAME key: one task
      // builds, its siblings wait and share
      val ref = cache.computeIfAbsent(key,
        _ => new java.lang.ref.SoftReference[AnyRef](build()))
      result = ref.get()
      if (result == null) cache.remove(key, ref) // collected: rebuild
    }
    if (cache.size > 64) { // drop collected entries, bound stale ids
      val it = cache.entrySet().iterator()
      while (it.hasNext) if (it.next().getValue.get() == null) it.remove()
    }
    result.asInstanceOf[T]
  }
}

/** Serializable recipe shipped in the codegen references array; builds
  * the [[AsOfProbeIndex]] on first use inside the generated task.
  * `keyMode`: 0 = single long (boxed), 1 = single UTF8String, 2 =
  * composite UnsafeRow of all key columns (the generated probe side
  * builds the same row shape with GenerateUnsafeProjection). */
final class AsOfIndexBuilder(
    bc: org.apache.spark.broadcast.Broadcast[Array[InternalRow]],
    rOut: Seq[Attribute],
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    carry: Seq[Attribute],
    keyMode: Int,
    timeIsInt: Boolean,
    forward: Boolean) extends Serializable {

  /** Executor-cached: one physical build per executor, not per task. */
  def build(): AsOfProbeIndex =
    AsOfIndexCache.getOrBuild(bc.id,
      (1, rightKeys.map(_.exprId.id), rightTime.exprId.id, carry.map(_.exprId.id),
        keyMode, timeIsInt, forward),
      () => buildIndex())

  private def buildIndex(): AsOfProbeIndex = {
    val rKeyIdxs = rightKeys.map(k => rOut.indexWhere(_.exprId == k.exprId))
    val rKeyIdx = rKeyIdxs.head
    val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    val keyProj = UnsafeProjection.create(rightKeys, rOut)
    val carryProj = UnsafeProjection.create(carry, rOut)
    val grouped = mutable.HashMap.empty[AnyRef, mutable.ArrayBuffer[(Long, UnsafeRow)]]
    bc.value.foreach { r =>
      if (!rKeyIdxs.exists(r.isNullAt) && !r.isNullAt(rTimeIdx)) {
        val t = if (timeIsInt) r.getInt(rTimeIdx).toLong else r.getLong(rTimeIdx)
        // keys are copied out of the row buffer so index entries never
        // alias broadcast row storage
        val k: AnyRef = keyMode match {
          case 0 => java.lang.Long.valueOf(r.getLong(rKeyIdx))
          case 1 => r.getUTF8String(rKeyIdx).copy()
          case _ => keyProj(r).copy()
        }
        grouped.getOrElseUpdate(k, mutable.ArrayBuffer.empty) +=
          ((t, carryProj(r).copy()))
      }
    }
    val map = new java.util.HashMap[AnyRef, (Array[Long], Array[UnsafeRow])](
      grouped.size * 2 + 1)
    grouped.foreach { case (k, buf) =>
      val sorted = buf.sortBy(_._1)
      map.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
    }
    new AsOfProbeIndex(map, forward)
  }
}

/** Physical broadcast as-of join. Declares
  * `BroadcastDistribution(IdentityBroadcastMode)` on the right so
  * EnsureRequirements inserts the standard BroadcastExchange (AQE
  * wraps it in a broadcast query stage as usual); the left side keeps
  * its distribution AND its ordering — this node is a per-row map
  * over the fact stream. Each partition builds a key -> time-sorted
  * carry-row index from the broadcast array (dimension-sized, so the
  * O(|R| log |R|) build is noise), then probes with a floor binary
  * search per fact row. */
case class BroadcastAsOfJoinExec(
    leftKeys: Seq[Attribute],
    leftTime: Attribute,
    rightKeys: Seq[Attribute],
    rightTime: Attribute,
    carry: Seq[Attribute],
    forward: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode
  with org.apache.spark.sql.execution.CodegenSupport {

  override def output: Seq[Attribute] = left.output ++ carry

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  // ---- whole-stage codegen: the fact side stays inside the stream's
  // codegen span; the probe is one static-shaped call per row. The
  // generated path keys the index by boxed long, UTF8String (the
  // reference's own flagship as-of keys on a VARCHAR device id —
  // ingest-ddl.sql:2, etl-ddl-backfill.sql:116), or a composite
  // UnsafeRow for tuple keys (built by GenerateUnsafeProjection, the
  // same shape Spark's hash-join codegen uses for its stream-side
  // key). Every key shape stays inside the span.
  override def supportCodegen: Boolean =
    leftKeys.nonEmpty &&
      left.isInstanceOf[org.apache.spark.sql.execution.CodegenSupport]

  private def keyMode: Int =
    if (leftKeys.size > 1) 2
    else leftKeys.head.dataType match {
      case LongType => 0
      case org.apache.spark.sql.types.StringType => 1
      case _ => 2
    }

  // This node itself is 1:1 (one output row per input row) and carry
  // values come from stable copied index rows, so IT never forces a
  // copy — but the streamed child's requirement must still surface: if
  // a multi-output operator (e.g. a duplicate-key broadcast hash join)
  // sits under the as-of in the same codegen span, the top-level
  // append() must copy or every buffered row aliases one reused
  // UnsafeRow. Do NOT call super: the default walks BOTH children and
  // the broadcast side isn't part of this codegen tree.
  override def needCopyResult: Boolean = left match {
    case c: org.apache.spark.sql.execution.CodegenSupport => c.needCopyResult
    case _ => false
  }

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].inputRDDs()

  override protected def doProduce(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext): String =
    left.asInstanceOf[org.apache.spark.sql.execution.CodegenSupport].produce(ctx, this)

  override def doConsume(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      input: Seq[org.apache.spark.sql.catalyst.expressions.codegen.ExprCode],
      row: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode): String = {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, ExprCode, JavaCode}
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.BindReferences
    val bc = right.executeBroadcast[Array[InternalRow]]()
    val timeIsInt = rightTime.dataType == DateType || rightTime.dataType == IntegerType
    val mode = keyMode
    val builder = new AsOfIndexBuilder(
      bc, right.output, rightKeys, rightTime, carry, mode, timeIsInt, forward)
    val builderRef = ctx.addReferenceObj("asofBuilder", builder,
      classOf[AsOfIndexBuilder].getName)
    val idxTerm = ctx.addMutableState(classOf[AsOfProbeIndex].getName, "asofIndex")
    ctx.currentVars = input
    // scalar modes evaluate the single key column; tuple mode builds
    // the composite UnsafeRow key with GenerateUnsafeProjection (what
    // HashJoin's codegen does for its stream-side key)
    val keyEv =
      if (mode == 2)
        org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
          .createCode(ctx, leftKeys.map(k => BindReferences.bindReference(
            k: org.apache.spark.sql.catalyst.expressions.Expression, left.output)))
      else BindReferences.bindReference(
        leftKeys.head: org.apache.spark.sql.catalyst.expressions.Expression,
        left.output).genCode(ctx)
    val timeEv = BindReferences.bindReference(
      leftTime: org.apache.spark.sql.catalyst.expressions.Expression, left.output).genCode(ctx)
    val matched = ctx.freshName("asofMatched")
    val carryVars = carry.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofIsNull")
      val value = ctx.freshName("asofValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val getter = CodeGenerator.getValue(matched, a.dataType, i.toString)
      val codeStr =
        s"""
           |boolean $isNull = ($matched == null) || $matched.isNullAt($i);
           |$jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} : ($getter);
         """.stripMargin
      ExprCode(code"$codeStr",
        JavaCode.isNullVariable(isNull), JavaCode.variable(value, a.dataType))
    }
    // string/tuple keys dispatch to the AnyRef overload (UTF8String /
    // UnsafeRow value equality); long keys hit the primitive overload.
    // Tuple keys with a null field probe harmlessly: the index holds
    // no null-field keys (right rows with null keys never match), so
    // the lookup misses — same carry-NULL outcome as the scalar guard.
    val keyArg =
      if (mode == 0) s"${keyEv.value}" else s"(Object) ${keyEv.value}"
    // carryVars keep their code attached: consume() emits it exactly
    // once (via evaluateRequiredVariables or the row projection).
    // Emitting it here TOO would declare each variable twice and fail
    // janino compilation -> silent interpreted fallback.
    s"""
       |if ($idxTerm == null) { $idxTerm = $builderRef.build(); }
       |${keyEv.code}
       |${timeEv.code}
       |org.apache.spark.sql.catalyst.expressions.UnsafeRow $matched = null;
       |if (!(${keyEv.isNull}) && !(${timeEv.isNull})) {
       |  $matched = $idxTerm.probe($keyArg, (long) ${timeEv.value});
       |}
       |${consume(ctx, input ++ carryVars)}
     """.stripMargin
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Physical long extraction for the supported time types (all
    * long- or int-backed, so the probe compares primitives). */
  private def asLong(dt: DataType): (InternalRow, Int) => Long = dt match {
    case TimestampType | TimestampNTZType | LongType => (r, i) => r.getLong(i)
    case DateType | IntegerType => (r, i) => r.getInt(i).toLong
    case other => throw new UnsupportedOperationException(
      s"as-of time column must be timestamp/date/integral, got $other")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    val bRows = right.executeBroadcast[Array[InternalRow]]()
    val rOut = right.output
    val lOut = left.output
    val rKeyIdxs = rightKeys.map(k => rOut.indexWhere(_.exprId == k.exprId))
    val rTimeIdx = rOut.indexWhere(_.exprId == rightTime.exprId)
    val lKeyIdxs = leftKeys.map(k => lOut.indexWhere(_.exprId == k.exprId))
    val lTimeIdx = lOut.indexWhere(_.exprId == leftTime.exprId)
    require(rKeyIdxs.forall(_ >= 0) && rTimeIdx >= 0, "right key/time not in child output")
    require(lKeyIdxs.forall(_ >= 0) && lTimeIdx >= 0, "left key/time not in child output")
    val rGetT = asLong(rightTime.dataType)
    val lGetT = asLong(leftTime.dataType)
    val carryAttrs = carry
    val outAttrs = output
    val rightKeyAttrs = rightKeys
    val leftKeyAttrs = leftKeys

    val recipe = (2, rightKeyAttrs.map(_.exprId.id), rightTime.exprId.id,
      carryAttrs.map(_.exprId.id), forward)
    left.execute().mapPartitions({ iter =>
      // executor-cached like the codegen path: one build per executor
      val index = AsOfIndexCache.getOrBuild(bRows.id, recipe, () => {
        val rKeyProj = UnsafeProjection.create(rightKeyAttrs, rOut)
        val carryProj = UnsafeProjection.create(carryAttrs, rOut)
        val grouped = mutable.HashMap.empty[UnsafeRow, mutable.ArrayBuffer[(Long, UnsafeRow)]]
        bRows.value.foreach { r =>
          if (!rKeyIdxs.exists(r.isNullAt) && !r.isNullAt(rTimeIdx)) {
            val k = rKeyProj(r).copy()
            grouped.getOrElseUpdate(k, mutable.ArrayBuffer.empty) +=
              ((rGetT(r, rTimeIdx), carryProj(r).copy()))
          }
        }
        val idx = new java.util.HashMap[UnsafeRow, (Array[Long], Array[UnsafeRow])](
          grouped.size * 2 + 1)
        grouped.foreach { case (k, buf) =>
          val sorted = buf.sortBy(_._1)
          idx.put(k, (sorted.map(_._1).toArray, sorted.map(_._2).toArray))
        }
        idx
      })
      val lKeyProj = UnsafeProjection.create(leftKeyAttrs, lOut)
      val resultProj = UnsafeProjection.create(outAttrs, lOut ++ carryAttrs)
      val joined = new JoinedRow
      val nullCarry = new GenericInternalRow(carryAttrs.size)
      val fwd = forward
      iter.map { lrow =>
        var hit: UnsafeRow = null
        if (!lKeyIdxs.exists(lrow.isNullAt) && !lrow.isNullAt(lTimeIdx)) {
          val entry = index.get(lKeyProj(lrow))
          if (entry != null) {
            val times = entry._1
            val t = lGetT(lrow, lTimeIdx)
            var lo = 0
            var hi = times.length - 1
            var ans = -1
            if (fwd) {
              // least right time >= t (ceiling)
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) >= t) { ans = mid; hi = mid - 1 } else lo = mid + 1
              }
            } else {
              // greatest right time <= t (floor)
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
            }
            if (ans >= 0) hit = entry._2(ans)
          }
        }
        resultProj(joined(lrow, if (hit == null) nullCarry else hit))
      }
    }, preservesPartitioning = true)
  }
}
