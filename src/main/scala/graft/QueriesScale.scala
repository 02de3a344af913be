package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.sources.ViewingData

/** Round-7 scale operators: the join/aggregate shapes whose naive
  * declarative form stops working somewhere between 1 GB and 100 TB —
  * each entry pairs the correct result (DuckDB oracle) with the plan
  * that survives the scale-up, and a spec pins that plan.
  */
object QueriesScale {

  /** Point-in-interval range join ([[RangeJoin.intervalJoin]]): every
    * event landing inside a 30-minute window opened by each signup.
    * Written with no equality conjunct, Catalyst's only options are
    * BroadcastNestedLoopJoin or a cartesian product — |events| ×
    * |windows| comparisons, fatal with two large sides. The operator
    * rewrites it to a shuffle EQUI-join on time buckets (points keep
    * one bucket, intervals explode to the buckets they overlap, the
    * original predicate stays as a residual filter), so the plan
    * scales like any other keyed join — AQE skew split included.
    * RangeJoinSpec pins no-nested-loop + parity with the naive form. */
  private val rangeJoin = Q(
    "q_range_join",
    (s, dir) => {
      val ev = ViewingData.table(s, dir, "events")
      val windows = ev.filter(col("event_type") === "signup")
        .select(col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("w_end"))
      RangeJoin.intervalJoin(
          ev.select("event_id", "ts", "event_type", "value"),
          "ts", windows, "w_start", "w_end", bucketSeconds = 1800L)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_hits"),
          round(sum(col("value")), 2).as("value_sum"))
    },
    Some("""SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_hits,
       ROUND(SUM(e.value), 2) AS value_sum
FROM events e JOIN (
  SELECT ts AS w_start, ts + INTERVAL 30 MINUTE AS w_end
  FROM events WHERE event_type = 'signup') w
ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY 1"""))

  /** Top-k per group as a MERGEABLE aggregate ([[plans.TopKByAgg]]):
    * the scale twin of q_topk_window. The window form shuffles EVERY
    * row to its group reducer for ranking; the k-bounded heap
    * pre-aggregates, so the shuffle carries at most k pairs per
    * (group, map task) — at 100 TB that is the difference between
    * shuffling the fact table and shuffling kilobytes. Result proven
    * identical to exact window ranking by the DuckDB oracle (the
    * (score DESC, id ASC) tiebreak makes both sides deterministic). */
  private val topkAgg = Q(
    "q_topk_agg",
    (s, dir) => {
      graft.plans.GraftExtensions.register(s)
      ViewingData.table(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(expr("topk_by(o_totalprice, o_orderkey, 3)").as("top"))
        .select(col("o_orderpriority"), posexplode(col("top")))
        .select(
          col("o_orderpriority"),
          (col("pos") + 1).cast("long").as("rnk"),
          col("col.id").as("o_orderkey"),
          round(col("col.score"), 2).as("price"))
    },
    Some("""SELECT o_orderpriority, CAST(rnk AS BIGINT) AS rnk, o_orderkey,
       ROUND(o_totalprice, 2) AS price
FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) t
WHERE rnk <= 3"""))

  /** Heavy hitters per day via Spark 4's native `approx_top_k` — the
    * Apache DataSketches frequent-items sketch behind Snowflake's
    * APPROX_TOP_K family. Like the HLL/GK rows in this registry, the
    * sketch is a fixed-width mergeable summary, so each map task folds
    * its rows locally and the shuffle carries one small buffer per
    * (day, task) instead of the raw rows; the ACCUMULATE / COMBINE /
    * ESTIMATE trio (persist per-day sketches, answer any later range
    * from the sketches alone) is pinned in HeavyHittersSpec. The
    * sketch purges nothing while tracked items stay under
    * maxItemsTracked, so on a low-cardinality column its counts are
    * EXACT — which is what lets a plain GROUP BY oracle hash-verify a
    * sketch query (the approximate regime's guarantees are spec
    * territory, same split as q_hll_reach). */
  private val heavyHitters = Q(
    "q_heavy_hitters",
    (s, dir) =>
      ViewingData.table(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(expr("approx_top_k(event_type, 5)").as("top"))
        .select(col("day").cast("string").as("day"), explode(col("top")))
        .select(col("day"), col("col.item").as("event_type"),
          col("col.count").cast("long").as("n")),
    Some("""SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1, 2"""))

  val all: Seq[Q] = Seq(rangeJoin, topkAgg, heavyHitters)
}
