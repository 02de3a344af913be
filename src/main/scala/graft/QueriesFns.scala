package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.ViewingData

/** Snowflake scalar/aggregate/window FUNCTION-surface parity rows the
  * earlier suites didn't cover: MIN_BY/MAX_BY, conditional aggregates
  * (COUNT_IF / BOOLAND_AGG / BOOLOR_AGG), CONDITIONAL_CHANGE_EVENT /
  * CONDITIONAL_TRUE_EVENT, RATIO_TO_REPORT, LIKE ANY / NOT LIKE ALL /
  * ILIKE, and CONVERT_TIMEZONE. All scan-speed expression work — the
  * scale question for each is only "does the plan stay one pass"; the
  * grouped variants pre-aggregate map-side like any hash aggregate,
  * the window variants ride one keyed exchange.
  */
object QueriesFns {

  /** Snowflake MIN_BY / MAX_BY (reference capability: full ANSI OLAP
    * surface, SURVEY §1): per priority class, the order id carrying
    * the extreme price. Spark's max_by/min_by with a (price, key)
    * STRUCT ordering makes ties deterministic — equal prices resolve
    * to the larger/smaller key, which is what lets a hash-compared
    * oracle exist at all. The DuckDB twin states the same semantics as
    * window ranking (its arg_max can't take a composite ordering). */
  private val minmaxBy = Q(
    "q_minmax_by",
    (s, dir) => {
      val o = ViewingData.table(s, dir, "orders")
      o.groupBy("o_orderpriority")
        .agg(
          max_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("dearest_order"),
          min_by(col("o_orderkey"),
            struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderpriority,
       CAST(MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS BIGINT) AS dearest_order,
       CAST(MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS BIGINT) AS cheapest_order,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT o_orderpriority, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
  FROM orders)
GROUP BY 1"""))

  /** COUNT_IF / BOOLAND_AGG / BOOLOR_AGG — Snowflake's conditional
    * and boolean aggregates, all one-pass partial-aggregable (a
    * conditional count is a sum, a bool_and is a min — nothing here
    * widens the shuffle beyond one value per group per map task). */
  private val condAggs = Q(
    "q_cond_aggs",
    (s, dir) => {
      val o = ViewingData.table(s, dir, "orders")
      o.groupBy("o_orderstatus")
        .agg(
          count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_positive"),
          bool_or(col("o_totalprice") > 400000).as("any_huge"),
          count(lit(1)).as("n"))
    },
    Some("""SELECT o_orderstatus,
       CAST(COUNT(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_totalprice > 400000) AS any_huge,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY 1"""))

  /** CONDITIONAL_CHANGE_EVENT / CONDITIONAL_TRUE_EVENT — Snowflake's
    * sessionization-adjacent event counters: a running count that
    * ticks when an expression CHANGES (channel switches, state
    * transitions) or when a predicate holds. Both are one LAG + one
    * cumulative SUM on the SAME (user, ts) window — Spark plans a
    * single Sort+Window pass, so the cost is one keyed exchange, the
    * q_sessionize shape. Reported per user: total switches and total
    * qualifying events (the counters' final values). */
  private val changeEvents = Q(
    "q_change_events",
    (s, dir) => {
      val ev = ViewingData.table(s, dir, "events")
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))
        .withColumn("chg",
          when(not(col("event_type") <=> lag("event_type", 1).over(w)), 1L)
            .otherwise(0L))
        .withColumn("change_id", sum("chg").over(run))
        .withColumn("true_id",
          sum(when(col("value") > 50.0, 1L).otherwise(0L)).over(run))
        .groupBy("user_id")
        .agg(max("change_id").as("n_switches"),
          max("true_id").as("n_high_value"),
          count(lit(1)).as("n_events"))
    },
    Some("""SELECT user_id,
       CAST(MAX(change_id) AS BIGINT) AS n_switches,
       CAST(MAX(true_id) AS BIGINT) AS n_high_value,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM (
  SELECT user_id,
         SUM(chg) OVER w2 AS change_id,
         SUM(CASE WHEN value > 50.0 THEN 1 ELSE 0 END) OVER w2 AS true_id
  FROM (
    SELECT user_id, ts, event_id, value,
           CASE WHEN event_type IS DISTINCT FROM
                     LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                THEN 1 ELSE 0 END AS chg
    FROM events)
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING))
GROUP BY 1"""))

  /** RATIO_TO_REPORT — each day's share of its event type's total
    * volume. The window SUM over the full partition is the textbook
    * two-pass-free form: Spark computes the partition total in the
    * same Window exec as the projection, one exchange on the (tiny)
    * grouped frame — the fact table was already reduced by the
    * count aggregate before any window runs. */
  private val ratioReport = Q(
    "q_ratio_report",
    (s, dir) => {
      val ev = ViewingData.table(s, dir, "events")
      val daily = ev.groupBy(col("event_type"),
          to_date(col("ts")).cast("string").as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
      daily.withColumn("share",
          round(col("n") / sum("n").over(Window.partitionBy("event_type")), 6))
        .select(col("event_type"), col("day"), col("n").cast("long").as("n"),
          col("share"))
    },
    Some("""SELECT event_type, day, CAST(n AS BIGINT) AS n,
       ROUND(n / SUM(n) OVER (PARTITION BY event_type), 6) AS share
FROM (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY 1, 2)"""))

  /** LIKE ANY / NOT LIKE ALL / ILIKE — Snowflake's multi-pattern
    * predicates, written in Spark SQL's own LIKE ANY/ALL syntax (the
    * DuckDB twin expands to OR/AND — same semantics). Pattern
    * predicates are scan-speed codegen'd `contains`/`startsWith`
    * specializations; nothing shuffles until the one-row rollup. */
  private val likeAny = Q(
    "q_like_any",
    (s, dir) => {
      ViewingData.table(s, dir, "part").createOrReplaceTempView("graft_part")
      s.sql("""SELECT
        CAST(COUNT_IF(p_name LIKE ANY ('%red%', 'bl%')) AS BIGINT) AS n_any,
        CAST(COUNT_IF(p_name NOT LIKE ALL ('%red%', '%blue%')) AS BIGINT) AS n_not_all,
        CAST(COUNT_IF(p_name ILIKE '%RED%') AS BIGINT) AS n_ilike,
        CAST(COUNT_IF(p_type LIKE 'small%' AND p_name LIKE '%bolt%') AS BIGINT) AS n_conj
      FROM graft_part""")
    },
    Some("""SELECT
  CAST(COUNT(*) FILTER (WHERE p_name LIKE '%red%' OR p_name LIKE 'bl%') AS BIGINT) AS n_any,
  CAST(COUNT(*) FILTER (WHERE p_name NOT LIKE '%red%' AND p_name NOT LIKE '%blue%') AS BIGINT) AS n_not_all,
  CAST(COUNT(*) FILTER (WHERE p_name ILIKE '%RED%') AS BIGINT) AS n_ilike,
  CAST(COUNT(*) FILTER (WHERE p_type LIKE 'small%' AND p_name LIKE '%bolt%') AS BIGINT) AS n_conj
FROM part"""))

  /** CONVERT_TIMEZONE — UTC event times to wall-clock in two zones
    * (fixed-offset Tokyo and DST-observing New York), aggregated per
    * local NY hour. Both engines resolve the SAME IANA tzdb, which is
    * the portability property worth pinning: a training pipeline that
    * partitions by local day must agree with the warehouse it
    * replaced. Spark's convert_timezone yields TIMESTAMP_NTZ (naive
    * wall clock) — exactly Snowflake's CONVERT_TIMEZONE(src, tgt, ntz)
    * contract. */
  private val timezone = Q(
    "q_timezone",
    (s, dir) => {
      val ev = ViewingData.table(s, dir, "events")
      ev.select(
          date_trunc("hour",
            convert_timezone(lit("UTC"), lit("America/New_York"), col("ts")))
            .cast("string").as("ny_hour"),
          convert_timezone(lit("UTC"), lit("Asia/Tokyo"), col("ts")).as("tokyo_ts"))
        .groupBy("ny_hour")
        .agg(count(lit(1)).as("n"),
          max(col("tokyo_ts")).cast("string").as("last_tokyo"))
    },
    Some("""SELECT CAST(DATE_TRUNC('hour',
         ts AT TIME ZONE 'UTC' AT TIME ZONE 'America/New_York') AS VARCHAR) AS ny_hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Tokyo') AS VARCHAR) AS last_tokyo
FROM events GROUP BY 1"""))

  val all: Seq[Q] =
    Seq(minmaxBy, condAggs, changeEvents, ratioReport, likeAny, timezone)
}
