package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.ViewingData

/** Pins the two things that make [[RangeJoin.intervalJoin]] the 100-TB
  * plan: (a) result parity with the naive non-equi join (the semantic
  * definition), (b) the physical plan is an EQUI-join — no
  * BroadcastNestedLoopJoin / CartesianProduct anywhere, even with
  * broadcast disabled (the naive form's only large×large fallback).
  */
class RangeJoinSpec extends SparkTestBase {

  private def events = ViewingData.table(spark, Sf, "events")

  private def windows = events
    .filter(col("event_type") === "signup")
    .select(col("ts").as("w_start"),
      (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))

  private def points = events.select(col("event_id"), col("ts"))

  test("parity with the naive non-equi join, pair-exact (no dups, no misses)") {
    val got = RangeJoin.intervalJoin(points, "ts", windows, "w_start", "w_end", 1800L)
      .select("event_id", "w_start")
    val naive = points.join(
        windows, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "w_start")
    assert(got.count() > 0, "test shape must actually produce matches")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
      "bucketed join must return exactly the naive join's multiset of pairs")
  }

  test("bucket width independence: oversized and undersized buckets stay exact") {
    val ref = RangeJoin.intervalJoin(points, "ts", windows, "w_start", "w_end", 1800L).count()
    for (b <- Seq(60L, 700L, 86400L)) {
      val n = RangeJoin.intervalJoin(points, "ts", windows, "w_start", "w_end", b).count()
      assert(n == ref, s"bucketSeconds=$b: $n != $ref")
    }
  }

  test("plan is an equi-join: no nested loop / cartesian even without broadcast") {
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val plan = RangeJoin
        .intervalJoin(points, "ts", windows, "w_start", "w_end", 1800L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join must plan as an equi-join:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join with broadcast off:\n$plan")
    }
  }

  test("null times and null bounds match nothing (naive-join semantics)") {
    import spark.implicits._
    val p = Seq((1L, Some(100L)), (2L, None))
      .toDF("pid", "sec").select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
    val iv = Seq((10L, Some(50L), Some(150L)), (11L, None, Some(150L)), (12L, Some(50L), None))
      .toDF("iid", "s", "e")
      .select(col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    val got = RangeJoin.intervalJoin(p, "pt", iv, "ws", "we", 60L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 10L)))
  }

  test("keyed variant: parity with the naive key+range join, pair-exact") {
    val kWindows = events
      .filter(col("event_type") === "signup")
      .select(col("user_id").as("w_user"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 6 HOURS")).as("w_end"))
    val kPoints = events.select(col("event_id"), col("user_id"), col("ts"))
    val got = RangeJoin.intervalJoinKeyed(
        kPoints, "ts", Seq("user_id"),
        kWindows, "w_start", "w_end", Seq("w_user"), 21600L)
      .select("event_id", "w_start")
    val naive = kPoints.join(
        kWindows,
        col("user_id") === col("w_user") &&
          col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "w_start")
    assert(got.count() > 0)
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
  }

  test("explode guard: an interval spanning > maxBucketsPerInterval buckets fails loudly") {
    import spark.implicits._
    val p = Seq((1L, 100L)).toDF("pid", "sec")
      .select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
    val yearLong = Seq((10L, 0L, 365L * 86400)).toDF("iid", "s", "e")
      .select(col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    val err = intercept[Exception] {
      RangeJoin.intervalJoin(p, "pt", yearLong, "ws", "we", 60L).collect()
    }
    assert(err.getMessage.contains("buckets"), err.getMessage)
    // the same interval with a sane bucket passes
    val ok = RangeJoin.intervalJoin(p, "pt", yearLong, "ws", "we", 7 * 86400L)
    assert(ok.count() == 1)
  }

  test("mixed time types: NTZ intervals against zoned points, non-UTC session tz") {
    import spark.implicits._
    // buckets and residual must share ONE interpretation (NTZ wall
    // clock IS UTC) — deriving buckets as-UTC while the residual
    // coerces NTZ through the session zone would silently drop every
    // match whose session-zone offset exceeds the bucket width
    withConfs("spark.sql.session.timeZone" -> "Asia/Tokyo") {
      val p = Seq((1L, 1762072260L), (2L, 1762075900L), (3L, 1762079500L))
        .toDF("pid", "sec")
        .select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
      // [08:31, 09:31) and [09:31, 10:31) UTC wall clock as NTZ
      val iv = Seq((10L, "2025-11-02 08:31:00", "2025-11-02 09:31:00"),
          (11L, "2025-11-02 09:31:00", "2025-11-02 10:31:00"))
        .toDF("iid", "s", "e")
        .select(col("iid"), to_timestamp_ntz(col("s")).as("ws"),
          to_timestamp_ntz(col("e")).as("we"))
      val got = RangeJoin.intervalJoin(p, "pt", iv, "ws", "we", 600L)
        .select("pid", "iid").as[(Long, Long)].collect().toSet
      // 1762072260 = 08:31:00Z -> window 10; 1762075900 = 09:31:40Z
      // -> window 11; 1762079500 = 10:31:40Z -> no window
      assert(got == Set((1L, 10L), (2L, 11L)), s"got $got")
    }
  }

  test("date intervals: UTC-midnight interpretation, session-tz-independent") {
    import spark.implicits._
    val p = Seq((1L, 86400L + 3600L), (2L, 3 * 86400L))
      .toDF("pid", "sec")
      .select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
    val iv = Seq((10L, "1970-01-02", "1970-01-03"))
      .toDF("iid", "s", "e")
      .select(col("iid"), col("s").cast("date").as("ws"),
        col("e").cast("date").as("we"))
    for (tz <- Seq("UTC", "Asia/Tokyo")) {
      withConfs("spark.sql.session.timeZone" -> tz) {
        val got = RangeJoin.intervalJoin(p, "pt", iv, "ws", "we", 3600L)
          .select("pid", "iid").as[(Long, Long)].collect().toSet
        assert(got == Set((1L, 10L)), s"tz=$tz: $got")
      }
    }
  }

  test("streaming enrichment: interval join runs inside foreachBatch, batch parity") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rjstream").toString + "/t"
    // static campaign windows (the growing-table case just re-reads
    // the windows source per batch — same composition)
    val iv = Seq((100L, 50L, 150L), (200L, 120L, 260L))
      .toDF("win_id", "s", "e")
      .select(col("win_id"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = input.toDF().toDF("pid", "sec").writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val pts = batch.select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
        RangeJoin.intervalJoin(pts, "pt", iv, "ws", "we", 60L)
          .select("pid", "win_id").write.mode("append").parquet(dir)
      }
      .start()
    try {
      input.addData((1L, 60L), (2L, 10L), (3L, 130L))
      q.processAllAvailable()
      input.addData((4L, 250L))
      q.processAllAvailable()
      val got = spark.read.parquet(dir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // 1 ∈ [50,150); 3 ∈ both windows; 2 in none; 4 ∈ [120,260)
      assert(got == Set((1L, 100L), (3L, 100L), (3L, 200L), (4L, 200L)))
    } finally q.stop()
  }

  test("auto bucket: derived width matches the manual result; degenerate intervals drop") {
    import spark.implicits._
    val manual = RangeJoin.intervalJoin(points, "ts", windows, "w_start", "w_end", 1800L)
      .count()
    val auto = RangeJoin.intervalJoinAuto(points, "ts", windows, "w_start", "w_end")
      .count()
    assert(auto == manual && auto > 0)
    // s >= e intervals match nothing and must not blow up the explode
    val degenerate = Seq((1L, 100L, 100L), (2L, 200L, 50L))
      .toDF("iid", "s", "e")
      .select(col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    assert(RangeJoin.intervalJoin(points, "ts", degenerate, "ws", "we", 60L)
      .count() == 0)
    // all-degenerate intervals: auto still works (falls back to 1 s)
    assert(RangeJoin.intervalJoinAuto(points, "ts", degenerate, "ws", "we")
      .count() == 0)
  }

  test("pre-1970 timestamps: negative epoch seconds bucket consistently (parity)") {
    import spark.implicits._
    // negative epochs exercise floor-vs-truncate division: the rewrite
    // is safe because the SAME monotone cast+floor is applied to points
    // and bounds, so a point's bucket always lies inside its interval's
    // covered range — pin that with pair-exact parity straddling 1970
    val p = Seq(1L -> -7200L, 2L -> -3601L, 3L -> -1L, 4L -> 0L, 5L -> 3599L, 6L -> -86400L)
      .toDF("pid", "sec").select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
    val iv = Seq((10L, -7250L, -7150L), (11L, -3650L, -3550L), (12L, -50L, 50L),
        (13L, -90000L, -80000L), (14L, -10L, 0L))
      .toDF("iid", "s", "e")
      .select(col("iid"), timestamp_seconds(col("s")).as("ws"),
        timestamp_seconds(col("e")).as("we"))
    for (b <- Seq(1L, 60L, 3600L)) {
      val got = RangeJoin.intervalJoin(p, "pt", iv, "ws", "we", b)
        .select("pid", "iid")
      val naive = p.join(iv, col("pt") >= col("ws") && col("pt") < col("we"))
        .select("pid", "iid")
      assert(got.count() > 0, s"b=$b: shape must match something")
      assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty,
        s"bucketSeconds=$b must be pair-exact across the 1970 boundary")
    }
  }

  test("sub-second bounds: fractional timestamps stay exact via the residual") {
    import spark.implicits._
    // integer-second buckets only COARSEN candidates; the residual
    // compares original (milli-precision) values. Points and bounds
    // deliberately differ only below the second.
    val p = Seq(1L -> 10500L, 2L -> 10100L, 3L -> 9900L, 4L -> 10900L, 5L -> -500L)
      .toDF("pid", "ms").select(col("pid"), timestamp_millis(col("ms")).as("pt"))
    val iv = Seq((10L, 10200L, 10900L),  // [10.2 s, 10.9 s): catches 10.5 only
        (11L, 9800L, 10200L),            // spans the 9→10 bucket edge
        (12L, -1200L, 300L))             // fractional straddling zero
      .toDF("iid", "sms", "ems")
      .select(col("iid"), timestamp_millis(col("sms")).as("ws"),
        timestamp_millis(col("ems")).as("we"))
    for (b <- Seq(1L, 7L)) {
      val got = RangeJoin.intervalJoin(p, "pt", iv, "ws", "we", b)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L), (3L, 11L), (2L, 11L), (5L, 12L)),
        s"bucketSeconds=$b: got $got")
    }
  }

  test("hot bucket: AQE's skew split handles it as ordinary equi-join skew") {
    // the operator's scale story delegates hot buckets (a traffic
    // spike) to AQE — pin that the bucketed join IS the shape AQE can
    // split: a 600k-point bucket against lowered skew thresholds gets
    // SortMergeJoin(skew=true) in the final adaptive plan, with the
    // result unchanged
    import spark.implicits._
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB") {
      val pts = (1 to 600000).map(i => (i.toLong, 1000L + (i % 30))) ++
        (1 to 100).map(i => (700000L + i, 100000L + i * 3600L))
      val p = pts.toDF("pid", "sec")
        .select(col("pid"), timestamp_seconds(col("sec")).as("pt"))
      val iv = ((1 to 200).map(i => (i.toLong, 995L, 1010L)) ++
        (1 to 50).map(i => (1000L + i, 100000L + i * 3600L - 10, 100000L + i * 3600L + 10)))
        .toDF("iid", "s", "e")
        .select(col("iid"), timestamp_seconds(col("s")).as("ws"),
          timestamp_seconds(col("e")).as("we"))
      val j = RangeJoin.intervalJoin(p, "pt", iv, "ws", "we", 60L)
      val qe = j.queryExecution
      val n = qe.toRdd.count()
      // correctness under the split: points 1000..1009 × 200 hot
      // intervals [995, 1010) + the 50 sparse self-matches
      val expected = p.join(iv,
        col("pt") >= col("ws") && col("pt") < col("we")).count()
      assert(n == expected, s"skew split must not change the result: $n vs $expected")
      assert(qe.executedPlan.toString.contains("SortMergeJoin(skew=true)"),
        s"expected AQE to mark the hot bucket skew=true:\n${qe.executedPlan}")
    }
  }

  test("rejects overlapping column names") {
    val e = intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(points, "ts",
        events.select(col("ts"), col("event_id").as("x")), "ts", "x", 60L)
    }
    assert(e.getMessage.contains("disjoint"))
  }

  test("overlap join: parity with naive OVERLAPS, exactly-once on long intervals") {
    import spark.implicits._
    // epoch-second intervals, several spanning MANY 60 s buckets (the
    // exactly-once risk: an overlapping pair shares every common
    // bucket; only its canonical max-start bucket may emit it)
    val l = Seq(
      (1L, "k1", 0L, 600L), (2L, "k1", 550L, 560L), (3L, "k1", 700L, 800L),
      (4L, "k2", 0L, 50L), (5L, "k2", 40L, 1000L), (6L, "k1", 600L, 700L))
      .toDF("a_id", "a_k", "a_s", "a_e")
    val r = Seq(
      (10L, "k1", 100L, 1200L), (20L, "k1", 590L, 610L),
      (30L, "k2", 900L, 950L), (40L, "k2", 45L, 47L))
      .toDF("b_id", "b_k", "b_s", "b_e")
    val bucketed = RangeJoin.intervalOverlapJoin(
        l, "a_s", "a_e", Seq("a_k"), r, "b_s", "b_e", Seq("b_k"), 60L)
      .select("a_id", "b_id").as[(Long, Long)].collect()
    val naive = l.crossJoin(r)
      .filter(col("a_k") === col("b_k") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e"))
      .select("a_id", "b_id").as[(Long, Long)].collect()
    assert(bucketed.length == bucketed.toSet.size, "pairs must be exactly-once")
    assert(bucketed.toSet == naive.toSet)
    assert(naive.toSet.contains((1L, 10L)), "long-interval pair present")
  }

  test("overlap join: q_coviewing's shape plans as an equi-join, no nested loop") {
    val p = SparkEntry.queries("q_coviewing")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"), p.take(1500))
  }
}
