package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** q_funnel hot-user skew: the per-user pair loop inside the two range
  * joins is bounded by the 1-hour window, but a pathological user with
  * thousands of views AND clicks inside one hour still pays
  * |views|×|clicks| pair comparisons for that key. This spec crafts
  * exactly that user (1000×1000 in-window pairs on one key, three
  * orders of magnitude denser than the synthetic feed) and pins that
  * the earliest-match semantics stay exact — the skew costs time on
  * one partition, never correctness. PLANS.md (round 5) documents the
  * bound and the mitigation ladder.
  */
class FunnelSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("a 1000x1000 in-window hot user keeps earliest-match exact") {
    val tmp = Files.createTempDirectory("funnelskew").toString
    val base = 1700000000L
    def ev(id: Long, t: Long, user: Long, typ: String) =
      (id, new Timestamp(t * 1000L), user, typ, 10.0, "{}")
    // hot user 1: every view converts (first click = max(500, t+1)),
    // and the single purchase at +1600 converts all of them
    val hot =
      (0L until 1000L).map(i => ev(i, base + i, 1L, "view")) ++
      (0L until 1000L).map(i => ev(2000L + i, base + 500L + i, 1L, "click")) ++
      Seq(ev(4000L, base + 1600L, 1L, "purchase"))
    // user 2: one view, no click — must not convert
    val cold = Seq(ev(5000L, base, 2L, "view"))
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")

    val out = SparkEntry.queries("q_funnel")(spark, tmp)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out == ((1001L, 1000L, 1000L, 0.999001, 1.0)),
      s"funnel counts must survive the hot user exactly: $out")
  }

  // the cap's three regimes against the same hot-user shape: views at
  // base+i (i<1000), clicks at base+500+i, one purchase at +1600 —
  // all inside one 3600 s bucket
  private def hotFrames = {
    val base = 1700000000L
    val views = (0L until 1000L).map(i => (1L, i, base + i))
      .toDF("user_id", "event_id", "t")
    val clicks = (0L until 1000L).map(i => (1L, base + 500L + i))
      .toDF("user_id", "t")
    val purchases = Seq((1L, base + 1600L)).toDF("user_id", "t")
    (views, clicks, purchases)
  }

  test("cap with k >= bucket density is exact") {
    val (views, clicks, purchases) = hotFrames
    val exact = graft.operators.Funnel.steps(views, clicks, purchases)
    val capped = graft.operators.Funnel.steps(views, clicks, purchases,
      capPerWindow = Some(1000))
    assert(capped.exceptAll(exact).isEmpty && exact.exceptAll(capped).isEmpty,
      "k >= per-(user, bucket) candidate count: capped == exact")
  }

  test("under-capped hot key undercounts deterministically; plan is a WindowGroupLimit") {
    val (views, clicks, purchases) = hotFrames
    // k=10 keeps clicks base+500..509 only; a view at base+i matches
    // iff some kept click is > base+i, i.e. i <= 508 -> 509 conversions
    val capped = graft.operators.Funnel.steps(views, clicks, purchases,
      capPerWindow = Some(10))
    assert(capped.filter(col("click_t").isNotNull).count() == 509L,
      "exactness condition violated -> bounded, deterministic undercount")
    capped.collect()
    val p = capped.queryExecution.executedPlan.toString
    // (k must stay <= spark.sql.window.group.limit.threshold, 1000,
    // for the rewrite to fire — the mitigation regime always is)
    assert(p.contains("WindowGroupLimit"),
      s"row_number<=k pre-cap must plan as WindowGroupLimit, not a full sort:\n$p")
  }

  test("cap is a no-op on organically sparse data (sf0.001 events)") {
    val ev = graft.sources.ViewingData.table(spark, Sf, "events").select(
      col("user_id"), col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("t"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("t"))
    val clicks = ev.filter(col("event_type") === "click").select(col("user_id"), col("t"))
    val purchases = ev.filter(col("event_type") === "purchase").select(col("user_id"), col("t"))
    // real per-(user, hour) density is tiny; k=64 is far above it, so
    // the capped funnel must be bit-identical to the exact one
    val exact = graft.operators.Funnel.steps(views, clicks, purchases)
    val capped = graft.operators.Funnel.steps(views, clicks, purchases,
      capPerWindow = Some(64))
    assert(capped.exceptAll(exact).isEmpty && exact.exceptAll(capped).isEmpty)
  }
}
