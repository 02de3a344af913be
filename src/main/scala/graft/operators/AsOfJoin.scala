package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks the right row with the greatest
  * timestamp <= its own, per key — the time-series join Spark has no
  * built-in operator for (PanelAsOf is its calendar-window cousin).
  *
  * Implementation is the union+window form, not a range join: tag the
  * sides, union, sort each key group by (ts, side) with right rows
  * first at equal ts, and carry right payloads forward with
  * last(ignoreNulls). ONE shuffle on the key, O(n log n) per group, no
  * row duplication — a range join would replicate every left row per
  * candidate right row before aggregating, which at 100 TB is the
  * difference between a working join and an exploding one.
  *
  * The carry columns are packed into a single struct and carried
  * forward with ONE last(ignoreNulls=true): the struct itself is
  * non-null on every right row, so the matched row's payload — nulls
  * included — arrives atomically. Filling each column independently
  * would substitute stale values for per-column nulls and could tear
  * a row across different right ancestors.
  *
  * Requirements: `rightCarry` column names must not collide with left
  * columns, and the right side should be unique per (key, ts) — ties
  * there have no defined winner (pre-aggregate, e.g. max per key+ts).
  */
object AsOfJoin {

  /** (ts, side[, carry]) window ordering: the carry struct joins as a
    * deterministic tiebreak when its type is orderable (maps aren't);
    * null carries (left rows) sort first so the right-before-left
    * equal-ts rule is untouched. */
  private def orderWithCarryTiebreak(
      tsCol: String, carryType: org.apache.spark.sql.types.DataType): Seq[Column] =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(carryType))
      Seq(col(tsCol), col("__side"), col("__carry").asc_nulls_first)
    else Seq(col(tsCol), col("__side"))

  def nearestBefore(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCarry: Seq[String]): DataFrame = {
    require(rightCarry.nonEmpty, "rightCarry must name at least one column")
    require(!rightCarry.exists(left.columns.contains),
      s"carry columns ${rightCarry.mkString(",")} collide with left columns")

    val r0 = right.select(col(keyCol), col(tsCol),
      struct(rightCarry.map(col): _*).as("__carry"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(r0.schema("__carry").dataType))
    val u = l.unionByName(r0, allowMissingColumns = true)

    // same discipline as nearestClosest: when the carry struct is
    // orderable it joins the ordering, so right-side duplicates at one
    // (key, ts) — a contract violation, but one that must not be
    // shuffle-order-dependent — resolve to the max carry every run
    val w = Window.partitionBy(keyCol)
      .orderBy(orderWithCarryTiebreak(tsCol, r0.schema("__carry").dataType): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        rightCarry.map(c => col(s"__carry.$c").as(c)): _*)
  }

  /** [[nearestBefore]] with a STALENESS bound — pandas
    * `merge_asof(tolerance=...)`: the latest prior right row matches
    * only while it is fresh enough; a staler ancestor yields NULLs,
    * exactly like no match at all (an as-of enrichment that silently
    * carries month-old state forward is usually a bug, not a join).
    * `stale(leftTs, matchedTs)` returns true when the match is TOO
    * old — the caller states the clock arithmetic (datediff, epoch
    * subtraction), so the operator stays type-agnostic. Same
    * single-shuffle plan: the matched timestamp rides the carry
    * struct and the bound is a scan-speed projection after the fill. */
  def nearestBeforeWithin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCarry: Seq[String],
      stale: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): DataFrame = {
    val rtCol = "__asof_rt"
    val joined = nearestBefore(
      left, right.withColumn(rtCol, col(tsCol)),
      keyCol, tsCol, rightCarry :+ rtCol)
    val tooStale = col(rtCol).isNull || stale(col(tsCol), col(rtCol))
    rightCarry.foldLeft(joined)((d, c) =>
        d.withColumn(c, when(tooStale, lit(null)).otherwise(col(c))))
      .drop(rtCol)
  }

  /** pandas `merge_asof(direction='nearest')`: the CLOSEST right row
    * in either direction, ties toward the earlier (before) match —
    * sensor alignment and event-to-snapshot matching where "latest
    * prior" is wrong half the time. One union + TWO windows on the
    * SAME (key, ts, side) ordering — Catalyst plans them on one
    * exchange/sort, so the cost is [[nearestBefore]] plus a second
    * window function, not a second shuffle. The matched timestamp
    * rides each carry struct; `dist(leftTs, matchedTs)` supplies the
    * orderable distance (datediff, abs epoch delta — caller's clock,
    * operator stays type-agnostic). */
  def nearestClosest(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCarry: Seq[String],
      dist: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
        org.apache.spark.sql.Column): DataFrame = {
    require(rightCarry.nonEmpty, "rightCarry must name at least one column")
    require(!rightCarry.exists(left.columns.contains),
      s"carry columns ${rightCarry.mkString(",")} collide with left columns")
    val r0 = right.select(col(keyCol), col(tsCol),
      struct(col(tsCol).as("__rt") +: rightCarry.map(col): _*).as("__carry"))
      .withColumn("__side", lit(0))
    val l = left.withColumn("__side", lit(1))
      .withColumn("__carry", lit(null).cast(r0.schema("__carry").dataType))
    val u = l.unionByName(r0, allowMissingColumns = true)
    // right rows sort BEFORE left at an equal instant: an equal-ts
    // match lands in the "before" window at distance 0 and wins any
    // tie — merge_asof's own equal-timestamp rule. The carry struct
    // itself is the THIRD ordering key (when its type is orderable):
    // duplicate right rows at the same (key, ts) then resolve to the
    // max-carry row on every run, instead of whichever the shuffle
    // happened to deliver last. Null carries (left rows) sort first,
    // so the side rule above is untouched.
    val carryOrderable = org.apache.spark.sql.catalyst.expressions
      .RowOrdering.isOrderable(r0.schema("__carry").dataType)
    val ordCols =
      if (carryOrderable)
        Seq(col(tsCol), col("__side"), col("__carry").asc_nulls_first)
      else Seq(col(tsCol), col("__side"))
    val ord = Window.partitionBy(keyCol).orderBy(ordCols: _*)
    val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    u.withColumn("__b", last(col("__carry"), ignoreNulls = true).over(wb))
      .withColumn("__a", first(col("__carry"), ignoreNulls = true).over(wa))
      .filter(col("__side") === 1)
      .withColumn("__pick",
        when(col("__b").isNull, col("__a"))
          .when(col("__a").isNull, col("__b"))
          .when(dist(col(tsCol), col("__a.__rt")) <
            dist(col(tsCol), col("__b.__rt")), col("__a"))
          .otherwise(col("__b"))) // ties toward before
      .select(left.columns.map(col) ++
        rightCarry.map(c => col(s"__pick.$c").as(c)): _*)
  }

  /** [[nearestBefore]] as the custom BROADCAST physical operator
    * ([[graft.plans.BroadcastAsOfJoin]]): same semantics, but the left
    * (fact) side is NEVER shuffled or sorted — each row probes a
    * broadcast per-key sorted index. Use when the right side is
    * dimension-sized (it is broadcast in full); fall back to
    * `nearestBefore` when both sides are large. */
  def nearestBeforeBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCarry: Seq[String]): DataFrame =
    broadcastAsOf(left, right, Seq(keyCol), tsCol, rightCarry, forward = false)

  /** Size-routed as-of: picks the broadcast probe for dimension-sized
    * right sides and the union+window form beyond `maxBroadcastBytes`
    * (default 128 MiB — an index comfortably inside executor memory),
    * using Catalyst's size estimate so NO job runs to decide — the
    * same discipline as Spark's autoBroadcastJoinThreshold. This is
    * the r6 decade-sweep crossover guidance as code: the broadcast
    * probe wins while the per-executor index fits (zero fact
    * exchange); past that, the shuffled form's one fact exchange is
    * the plan that survives. */
  def nearestBeforeAuto(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCarry: Seq[String],
      maxBroadcastBytes: Long = 128L << 20): DataFrame = {
    val est = right.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est <= BigInt(maxBroadcastBytes))
      nearestBeforeBroadcast(left, right, keyCol, tsCol, rightCarry)
    else nearestBefore(left, right, keyCol, tsCol, rightCarry)
  }

  /** Multi-column-key form: the as-of key is the tuple of `keyCols`
    * (e.g. (hh_id, title, content_id) for per-content rate cards). */
  def nearestBeforeBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightCarry: Seq[String]): DataFrame =
    broadcastAsOf(left, right, keyCols, tsCol, rightCarry, forward = false)

  /** Forward as-of: each left row picks the right row with the LEAST
    * timestamp >= its own, per key (DuckDB `ASOF ... ON l.t <= r.t`) —
    * next scheduled airing, next price change. Same broadcast
    * zero-fact-exchange plan; the probe is a ceiling search. */
  def nearestAfterBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightCarry: Seq[String]): DataFrame =
    broadcastAsOf(left, right, Seq(keyCol), tsCol, rightCarry, forward = true)

  private def broadcastAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      rightCarry: Seq[String],
      forward: Boolean): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column required")
    require(rightCarry.nonEmpty, "rightCarry must name at least one column")
    require(!rightCarry.exists(left.columns.contains),
      s"carry columns ${rightCarry.mkString(",")} collide with left columns")
    val spark = left.sparkSession
    graft.plans.GraftExtensions.register(spark)
    // Fresh-alias every right column so its exprIds can never collide
    // with the left subtree (self-join safe without analyzer dedup).
    val rdf = right.select(
      keyCols.zipWithIndex.map { case (k, i) => col(k).as(s"__asof_k$i") } ++
        (col(tsCol).as("__asof_t") +: rightCarry.map(c => col(c).as(c))): _*)
    val rplan = rdf.queryExecution.analyzed
    val rOut = rplan.output
    val rKeys = rOut.take(keyCols.size)
    val rTime = rOut(keyCols.size)
    val rCarry = rOut.drop(keyCols.size + 1)
    val lplan = left.queryExecution.analyzed
    def lAttr(name: String) = {
      val hits = lplan.output.filter(_.name.equalsIgnoreCase(name))
      require(hits.size == 1, s"left column $name resolved to ${hits.size} attributes")
      hits.head
    }
    val lKeys = keyCols.map(lAttr)
    val lt = lAttr(tsCol)
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"as-of key types differ for ${l.name}: ${l.dataType} vs ${r.dataType}")
    }
    require(lt.dataType == rTime.dataType,
      s"as-of time types differ: ${lt.dataType} vs ${rTime.dataType}")
    org.apache.spark.sql.graft.PlanBridge.dataFrame(spark,
      graft.plans.BroadcastAsOfJoin(lKeys, lt, rKeys, rTime, rCarry, forward,
        lplan, rplan))
  }
}
