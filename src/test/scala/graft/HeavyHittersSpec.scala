package graft

import org.apache.spark.sql.functions._

import graft.sources.ViewingData

/** q_heavy_hitters is oracle-gated in its exact regime (tracked items
  * under the sketch capacity → no purges → true counts). This spec
  * pins what the oracle can't: the PERSISTABLE sketch workflow
  * (accumulate per day once, combine+estimate any later range without
  * re-scanning events — Snowflake's APPROX_TOP_K_ACCUMULATE / COMBINE
  * / ESTIMATE), the approximate regime's heavy-hitter guarantee under
  * purges, and the partial-aggregation plan shape that makes the
  * sketch the 100-TB form.
  */
class HeavyHittersSpec extends SparkTestBase {

  test("accumulate per day -> combine == direct whole-period sketch") {
    val ev = ViewingData.table(spark, Sf, "events")
    ev.createOrReplaceTempView("hh_events")
    val merged = spark.sql("""
      SELECT approx_top_k_estimate(approx_top_k_combine(sk), 5) AS top FROM (
        SELECT CAST(ts AS DATE) AS day,
               approx_top_k_accumulate(event_type) AS sk
        FROM hh_events GROUP BY 1)""")
      .select(explode(col("top"))).select("col.item", "col.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    val direct = spark.sql(
        "SELECT approx_top_k(event_type, 5) AS top FROM hh_events")
      .select(explode(col("top"))).select("col.item", "col.count")
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(merged.nonEmpty && merged.toSeq == direct.toSeq)
    // exact regime: 5 distinct types never purge, counts are true
    val exact = ev.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(direct.toSeq == exact.toSeq)
  }

  test("approximate regime: dominant item survives purges with tight count") {
    import spark.implicits._
    // 50k rows: half one hot item, half spread over 25k distinct tails
    val n = 50000
    val df = spark.range(n).select(
      when(col("id") % 2 === 0, lit("hot"))
        .otherwise(concat(lit("tail_"), (col("id") / 2).cast("string")))
        .as("item"))
    val Array((item, cnt)) = df
      .agg(expr("approx_top_k(item, 1, 64)").as("top"))
      .select(explode(col("top"))).select("col.item", "col.count")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(item == "hot", s"the 50% item must be the top hitter, got $item")
    // frequent-items guarantee: estimate >= true - eps*n, never above
    // true + eps*n; with maxItemsTracked=64 eps is ~3.5/64 ≈ 5.5%
    assert(math.abs(cnt - n / 2) <= n * 0.06, s"count $cnt vs true ${n / 2}")
  }

  test("plan pre-aggregates: partial approx_top_k below the exchange") {
    val plan = ViewingData.table(spark, Sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("approx_top_k(event_type, 5)").as("top"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_top_k") || plan.contains("partial_approxtopk"),
      s"expected map-side sketch partials:\n$plan")
  }
}
