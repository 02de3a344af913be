package graft

import org.apache.spark.sql.functions._

/** HLL sketch partial aggregation (q_hll_reach): the two invariants
  * that make sketches the 100-TB distinct-count shape.
  *
  *  1. MERGEABILITY IS LOSSLESS: union of per-day sketches == one
  *     whole-period sketch, register for register — so rollups never
  *     re-scan events. DataSketches HLL insertion is deterministic
  *     per input SET (order-insensitive by construction), which makes
  *     this an exact equality, not an approximation.
  *  2. The estimate tracks the exact distinct count within the
  *     configured error (lgK=14 → rsd ~0.8%; assert 5% ≈ >5σ).
  */
class SketchSpec extends SparkTestBase {

  test("merged daily sketches == direct whole-period sketch estimate") {
    val ev = graft.sources.ViewingData.table(spark, Sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val merged = ev.groupBy("event_type", "day")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14))).as("est"))
    val m = merged.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val d = direct.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == d, s"sketch union must be lossless: $m vs $d")
  }

  test("estimate within 5% of exact distinct per group") {
    val ev = graft.sources.ViewingData.table(spark, Sf, "events")
    val est = SparkEntry.queries("q_hll_reach")(spark, Sf)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val e = est(k)
      assert(math.abs(e - n) <= math.max(1L, (n * 0.05).toLong),
        s"$k: estimate $e vs exact $n")
    }
  }

  test("bitmap_distinct == exact COUNT(DISTINCT); daily bitmap rollup == direct") {
    graft.plans.GraftExtensions.register(spark)
    val ev = graft.sources.ViewingData.table(spark, Sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val exact = ev.groupBy("event_type")
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(expr("bitmap_distinct(user_id)").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(direct == exact, "bitmap aggregate must be exact")
    // persist-then-merge: daily binary bitmaps OR-merged give the SAME
    // exact answer without touching events again
    val merged = ev.groupBy("event_type", "day")
      .agg(expr("bitmap_agg(user_id)").as("bm"))
      .groupBy("event_type")
      .agg(expr("bitmap_or_count(bm)").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged == exact, "bitmap OR-merge must be lossless and exact")
  }

  test("bitmap_and_count: exact overlap, unequal buffer widths, empty intersection") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 1000000L),          // wide buffer
      ("b", 2L), ("b", 3L),                           // narrow buffer
      ("c", 7L)                                       // disjoint from b
    ).toDF("seg", "id")
    val bm = df.groupBy("seg").agg(expr("bitmap_agg(id)").as("bm"))
    val pairs = bm.select(col("seg").as("sa"), col("bm").as("ba"))
      .crossJoin(bm.select(col("seg").as("sb"), col("bm").as("bb")))
      .select(col("sa"), col("sb"), expr("bitmap_and_count(ba, bb)").as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pairs(("a", "b")) == 1L && pairs(("b", "a")) == 1L) // {2}
    assert(pairs(("a", "a")) == 3L, "self-overlap = cardinality")
    assert(pairs(("b", "c")) == 0L, "disjoint segments")
  }

  test("bitmap buffer grows and serializes across sparse id ranges") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    // ids spanning five orders of magnitude force buffer growth,
    // serialization of uneven word lengths, and merge of unequal sizes
    val ids = Seq(0L, 1L, 63L, 64L, 1000L, 100000L, 1000000L, 1000000L)
    val n = ids.toDF("id").repartition(4)
      .agg(expr("bitmap_distinct(id)")).head.getLong(0)
    assert(n == ids.distinct.size)
  }

  test("quantile sketches: GK rank bound holds for direct AND daily-merged digests") {
    graft.plans.GraftExtensions.register(spark)
    val ev = graft.sources.ViewingData.table(spark, Sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        col("value").cast("double").as("v"))
    val direct = ev.groupBy("event_type")
      .agg(expr("qsketch_estimate(qsketch_agg(v), 0.5D)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val merged = SparkEntry.queries("q_quantile_sketch")(spark, Sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = ev.collect().map(r => (r.getString(0), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def rankOf(vs: Array[Double], x: Double): Double =
      vs.count(_ <= x).toDouble / vs.length
    rows.foreach { case (k, vs) =>
      // rank error bound: ε=1e-4 per digest; allow 2% slack for the
      // daily merge and value ties
      assert(math.abs(rankOf(vs, direct(k)) - 0.5) < 0.02,
        s"$k direct p50 rank ${rankOf(vs, direct(k))}")
      assert(math.abs(rankOf(vs, merged(k)._1) - 0.5) < 0.02,
        s"$k merged p50 rank ${rankOf(vs, merged(k)._1)}")
      assert(math.abs(rankOf(vs, merged(k)._2) - 0.95) < 0.02,
        s"$k merged p95 rank ${rankOf(vs, merged(k)._2)}")
    }
  }

  test("two estimates in one projection survive strict codegen (freshName regression)") {
    // q_quantile_sketch's real shape: p50 AND p95 off the same digest in
    // ONE select. A literal local name in QSketchEstimate.doGenCode
    // makes janino reject the whole stage (caught in a verify log as a
    // silent interpreted fallback) — strict mode turns that into a throw.
    graft.plans.GraftExtensions.register(spark)
    val ev = graft.sources.ViewingData.table(spark, Sf, "events")
      .select(col("event_type"), col("value").cast("double").as("v"))
    withStrictCodegen {
      val rows = ev.groupBy("event_type")
        .agg(expr("qsketch_agg(v)").as("sk"))
        .select(col("event_type"),
          expr("qsketch_estimate(sk, 0.5D)").as("p50"),
          expr("qsketch_estimate(sk, 0.95D)").as("p95"))
        .collect()
      assert(rows.nonEmpty && rows.forall(r => r.getDouble(1) <= r.getDouble(2)),
        "p50 must not exceed p95")
    }
  }

  test("hll set algebra: inclusion-exclusion intersection tracks exact on partial overlaps") {
    import spark.implicits._
    // crafted segments with REAL partial overlap (the sf corpus's users
    // all touch every event type, so q_hll_overlap's own rows are
    // degenerate full intersections): |A|=4000, |B|=4000, |A∩B|=2000.
    val rows = ((1 to 4000).map(i => ("a", i.toLong)) ++
      (2001 to 6000).map(i => ("b", i.toLong))).toDF("seg", "id")
    val sk = rows.groupBy("seg").agg(hll_sketch_agg(col("id"), lit(14)).as("sk"))
    val a = sk.filter(col("seg") === "a").select(col("sk").as("sk_a"))
    val b = sk.filter(col("seg") === "b").select(col("sk").as("sk_b"))
    val r = a.crossJoin(b).select(
        hll_sketch_estimate(col("sk_a")).as("ea"),
        hll_sketch_estimate(col("sk_b")).as("eb"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("eu"))
      .withColumn("ei", col("ea") + col("eb") - col("eu"))
      .head()
    // hll_sketch_estimate yields LONG (already-rounded cardinalities)
    val (ea, eb, eu, ei) = (r.getLong(0).toDouble, r.getLong(1).toDouble,
      r.getLong(2).toDouble, r.getLong(3).toDouble)
    // each base estimate within the sketch's ~1% band at lgK=14
    assert(math.abs(ea - 4000) / 4000.0 < 0.05, s"est A = $ea")
    assert(math.abs(eb - 4000) / 4000.0 < 0.05, s"est B = $eb")
    assert(math.abs(eu - 6000) / 6000.0 < 0.05, s"est U = $eu")
    // the differenced intersection compounds those errors — the bound
    // is relative to the UNION size, not the intersection: |err| ≤
    // ~3 sketch errors of the larger sets. Pin that, not a fantasy
    // tight bound.
    assert(math.abs(ei - 2000) < 0.15 * 6000, s"est intersect = $ei")
    // and on the sf data the full-overlap segments must estimate as such
    val hll = SparkEntry.queries("q_hll_overlap")(spark, Sf).collect()
    assert(hll.nonEmpty)
    hll.foreach { row =>
      val (sa, sb, su, si) = (row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
      assert(si <= math.min(sa, sb) + 0.05 * su,
        s"intersection estimate wildly exceeds min side: $row")
    }
  }

  test("plan: daily sketches pre-aggregate map-side (partial HLL agg)") {
    val p = SparkEntry.queries("q_hll_reach")(spark, Sf)
      .queryExecution.executedPlan.toString
    // two-level aggregate: partial hll_sketch_agg below the exchange,
    // merge above — the property that makes the rollup one pass
    assert(p.contains("partial_hll_sketch_agg") || p.contains("partial hll_sketch_agg")
      || "HashAggregate.*hll_sketch_agg".r.findAllIn(p).size >= 2, p)
  }
}
