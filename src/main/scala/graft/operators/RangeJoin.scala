package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, NumericType, TimestampNTZType, TimestampType}

/** Point-in-interval (range) join as an EQUI-join on time buckets.
  *
  * The declarative form — `events.join(intervals, ts >= s && ts < e)`
  * — has no equality conjunct, so Catalyst's only plans are
  * BroadcastNestedLoopJoin (fine while the interval side broadcasts)
  * or a cartesian product (fatal when both sides are large: at 100 TB
  * the comparison count is |events| × |intervals|). The standard
  * scale rewrite (DuckDB's IEJoin and Flink's interval join solve the
  * same problem) discretizes time into fixed buckets:
  *
  *  - each point lands in exactly ONE bucket (`floor(t / B)`);
  *  - each interval is exploded to every bucket it overlaps
  *    (`len/B + 2` rows for an interval of length `len`);
  *  - bucket equality + the original predicate as a residual filter
  *    gives a plain shuffle equi-join: comparisons drop from
  *    |events| × |intervals| to pairs sharing a bucket.
  *
  * No dedup step is needed: a point matches an interval in at most
  * one bucket — its own — so each qualifying (event, interval) pair
  * survives exactly once.
  *
  * Pick `bucketSeconds` near the TYPICAL interval length: much larger
  * buckets recreate the cross product inside each bucket; much
  * smaller ones multiply the interval side's explode factor. Hot
  * buckets (a traffic spike) are ordinary equi-join skew — AQE's
  * skew-join split or [[Skew.saltedJoin]] applies unchanged, which is
  * exactly why the rewrite targets an equi-join rather than a custom
  * physical operator.
  */
object RangeJoin {

  /** Ceiling on the explode factor of one interval — see the guard in
    * [[intervalJoinKeyed]]. Generous: a correctly sized bucket gives
    * 2-3 buckets per interval. */
  val maxBucketsPerInterval = 10000L

  /** The time column normalized to ONE zoned TimestampType under one
    * interpretation — NTZ wall-clock IS UTC (session-independent,
    * DST-safe via [[graft.functions.TimeFunctions]]), dates are UTC
    * midnight, numerics are epoch seconds (fractions preserved).
    * BOTH the bucket keys and the residual predicate read this
    * normalized column: deriving buckets one way and comparing raw
    * columns the other silently drops matches the moment the two
    * sides carry different time types. Rejecting anything
    * non-time-like turns the former three-frames-away Catalyst cast
    * error into a named contract failure at the operator door. */
  private def timeNorm(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case TimestampType    => col(c)
      case TimestampNTZType => graft.functions.TimeFunctions.ntzWallClockAsUtc(col(c))
      case DateType         => graft.functions.TimeFunctions.dateAsUtcMidnight(col(c))
      case _: NumericType   => timestamp_seconds(col(c))
      case other            => throw new IllegalArgumentException(
        s"RangeJoin: time column `$c` must be a timestamp, timestamp_ntz, " +
          s"date or numeric (epoch seconds); got ${other.simpleString}")
    }

  /** Epoch seconds of the normalized time — the bucket key. */
  private def epochSec(df: DataFrame, c: String): Column =
    timeNorm(df, c).cast("long")

  /** Joins `points` to `intervals` where
    * `points(pointTime) ∈ [intervals(startCol), intervals(endCol))`.
    *
    * Columns are named (not `Column` expressions) because the interval
    * side is often derived from the SAME source as the point side (a
    * self-join on event windows): distinct names + unqualified
    * resolution sidestep Spark's self-join attribute ambiguity. The
    * two frames must have disjoint column names; all three time
    * columns must be castable to long epoch seconds (timestamp or
    * numeric). Null times / null bounds match nothing, same as the
    * declarative form. */
  def intervalJoin(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketSeconds: Long): DataFrame =
    intervalJoinKeyed(points, pointTime, Seq.empty,
      intervals, startCol, endCol, Seq.empty, bucketSeconds)

  /** [[intervalJoin]] with the bucket width DERIVED from the data: the
    * median interval length (one tiny aggregate over the interval
    * side, driver control-plane scalar), rounded up to a power of two
    * so repeated runs over drifting data reuse stable widths. Use when
    * the caller can't know the interval profile up front; pass an
    * explicit `bucketSeconds` when they can. */
  def intervalJoinAuto(
      points: DataFrame,
      pointTime: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String): DataFrame = {
    val med = intervals
      .filter(col(startCol) < col(endCol))
      .agg(percentile_approx(
        epochSec(intervals, endCol) - epochSec(intervals, startCol),
        lit(0.5), lit(1000)))
      .head()
    val m = if (med.isNullAt(0)) 1L else math.max(1L, med.getLong(0))
    val bucket = java.lang.Long.highestOneBit(m) match {
      case h if h == m => m
      case h           => h << 1 // round UP to the next power of two
    }
    intervalJoin(points, pointTime, intervals, startCol, endCol, bucket)
  }

  /** [[intervalJoin]] with equality keys alongside the range — "events
    * inside windows OF THE SAME user" (the panel-window enrichment
    * shape). The keys join the bucket in the shuffle key, so hotness
    * concentrates only when (key, bucket) is hot — strictly finer
    * than the keyless join's time-only distribution.
    * `pointKeys(i)` pairs with `intervalKeys(i)`. */
  def intervalJoinKeyed(
      points: DataFrame,
      pointTime: String,
      pointKeys: Seq[String],
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      intervalKeys: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(pointKeys.length == intervalKeys.length,
      s"key lists must pair up: $pointKeys vs $intervalKeys")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint (rename: ${overlap.mkString(", ")})")
    val b = lit(bucketSeconds)
    val p = points.withColumn("__gr_pbucket", floor(epochSec(points, pointTime) / b))
    // s >= e matches nothing by definition — drop such intervals here
    // instead of exploding candidates the residual filter would discard
    val validIntervals = intervals.filter(
      timeNorm(intervals, startCol) < timeNorm(intervals, endCol))
    // integer-second bucketing may cover one bucket past a
    // fractional-second end bound — a false CANDIDATE only, removed by
    // the residual predicate below
    // a single interval spanning vastly more buckets than intended is
    // a misconfiguration that would silently explode the build side
    // (a year-long interval at 60 s buckets = 525 600 rows) — fail
    // loudly with the knob to turn instead
    val loB = floor(epochSec(intervals, startCol) / b)
    val hiB = floor(epochSec(intervals, endCol) / b)
    val guarded = when(
      hiB - loB > lit(maxBucketsPerInterval),
      raise_error(concat(
        lit(s"intervalJoin: an interval spans more than $maxBucketsPerInterval " +
          s"buckets of $bucketSeconds s — raise bucketSeconds toward the " +
          "typical interval length ("), col(startCol).cast("string"),
        lit(" .. "), col(endCol).cast("string"), lit(")"))))
      .otherwise(sequence(loB, hiB))
    val i = validIntervals.withColumn("__gr_ibucket", explode(guarded))
    // residual predicate on the SAME normalized columns the buckets
    // came from — one interpretation end to end, even when the two
    // sides carry different time types
    val pt = timeNorm(points, pointTime)
    val lo = timeNorm(intervals, startCol)
    val hi = timeNorm(intervals, endCol)
    val cond = pointKeys.zip(intervalKeys)
      .map { case (pk, ik) => col(pk) === col(ik) }
      .foldLeft(
        col("__gr_pbucket") === col("__gr_ibucket") &&
          pt >= lo && pt < hi)(_ && _)
    p.join(i, cond).drop("__gr_pbucket", "__gr_ibucket")
  }

  /** INTERVAL-×-INTERVAL overlap join (the SQL:2011 `OVERLAPS`
    * predicate, half-open: [s1,e1) ∩ [s2,e2) ≠ ∅ ⟺ s1 < e2 ∧ s2 < e1)
    * as a bucketed equi-join — the third member of the range family
    * (point-in-interval C51, keyed point C52, and now overlap). Both
    * sides explode their bucket spans; a pair that overlaps would meet
    * in EVERY shared bucket, so the join keeps only the canonical
    * first-overlap bucket — `max(startBucket₁, startBucket₂)` — which
    * any overlapping pair's two spans both contain (each interval
    * covers its own start bucket and runs past the later start):
    * exactly-once with NO dedup pass. Same per-interval span guard as
    * the other members; keys (e.g. the content id) ride the equi-join. */
  def intervalOverlapJoin(
      left: DataFrame,
      startL: String, endL: String, keysL: Seq[String],
      right: DataFrame,
      startR: String, endR: String, keysR: Seq[String],
      bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(keysL.length == keysR.length,
      s"key lists must pair up: $keysL vs $keysR")
    val overlapCols = left.columns.toSet.intersect(right.columns.toSet)
    require(overlapCols.isEmpty,
      s"column names must be disjoint (rename: ${overlapCols.mkString(", ")})")
    val b = lit(bucketSeconds)
    def explodeBuckets(df: DataFrame, s: String, e: String, out: String,
        startOut: String): DataFrame = {
      val loB = floor(epochSec(df, s) / b)
      val hiB = floor(epochSec(df, e) / b)
      val guarded = when(
        hiB - loB > lit(maxBucketsPerInterval),
        raise_error(concat(
          lit(s"intervalOverlapJoin: an interval spans more than " +
            s"$maxBucketsPerInterval buckets of $bucketSeconds s ("),
          col(s).cast("string"), lit(" .. "), col(e).cast("string"), lit(")"))))
        .otherwise(sequence(loB, hiB))
      df.filter(timeNorm(df, s) < timeNorm(df, e))
        .withColumn(startOut, loB)
        .withColumn(out, explode(guarded))
    }
    val l = explodeBuckets(left, startL, endL, "__gr_lb", "__gr_lsb")
    val r = explodeBuckets(right, startR, endR, "__gr_rb", "__gr_rsb")
    val s1 = timeNorm(left, startL); val e1 = timeNorm(left, endL)
    val s2 = timeNorm(right, startR); val e2 = timeNorm(right, endR)
    val cond = keysL.zip(keysR)
      .map { case (a, c) => col(a) === col(c) }
      .foldLeft(
        col("__gr_lb") === col("__gr_rb") &&
          col("__gr_lb") === greatest(col("__gr_lsb"), col("__gr_rsb")) &&
          s1 < e2 && s2 < e1)(_ && _)
    l.join(r, cond).drop("__gr_lb", "__gr_rb", "__gr_lsb", "__gr_rsb")
  }
}
