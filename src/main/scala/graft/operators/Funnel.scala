package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Earliest-match funnel (view → click → purchase within a window) —
  * the sequential-pattern workload behind q_funnel, factored out so
  * the skew mitigation ladder (PLANS.md round 5) is code, not prose.
  *
  * Shape: per step, one user-keyed range join followed by a
  * min-aggregate back to one row per base event. The per-user pair
  * loop is bounded by the window, but a bot-grade key with V views
  * and C clicks inside one window still pays V×C comparisons on one
  * partition. [[capCandidates]] is mitigation (2): bound C per
  * (user, window-bucket) ahead of the join, turning the worst key
  * into V×K.
  */
object Funnel {

  /** Keeps the earliest `k` candidate events per (key, window bucket)
    * — planned as a WindowGroupLimit (top-k per group at shuffle
    * speed, no full sort of the partition).
    *
    * EXACTNESS CONDITION. A base event at time t probes candidates in
    * (t, t+W], which spans its own bucket b = floor(t/W) and b+1. In
    * bucket b+1 every candidate is > t, so the true earliest match
    * there survives ANY k >= 1. In bucket b, candidates at or before
    * t occupy earliest-k slots without being matchable, so the true
    * match survives iff fewer than k same-bucket candidates are <= t.
    * Hence the cap is EXACT iff for every base event
    *   |{candidates c : bucket(c) = bucket(t), c.t <= t}| < k
    * — in particular whenever k >= the max candidate count of any
    * (key, bucket), and more usefully whenever per-key event density
    * inside one window stays below k (true for human-scale keys;
    * violated exactly by the bot keys the cap exists to bound). Under-
    * capped keys UNDERCOUNT conversions — the knob trades completeness
    * on pathological keys for a hard per-key cost bound. */
  def capCandidates(cand: DataFrame, keyCol: String, tCol: String,
      windowSec: Long, k: Int): DataFrame = {
    require(k >= 1, "cap must keep at least one candidate per bucket")
    val w = Window
      .partitionBy(col(keyCol), floor(col(tCol) / windowSec.toDouble))
      .orderBy(col(tCol))
    cand.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Per-view funnel steps: `views` (user_id, event_id, t) gains
    * `click_t` (first click in (t, t+W]) and `purchase_t` (first
    * purchase in (click_t, click_t+W]), NULL where the step didn't
    * convert. `capPerWindow` applies [[capCandidates]] to both
    * candidate sides; None is the exact, uncapped form. */
  def steps(views: DataFrame, clicks: DataFrame, purchases: DataFrame,
      windowSec: Long = 3600L, capPerWindow: Option[Int] = None): DataFrame = {
    val c0 = clicks.select(col("user_id").as("cu"), col("t").as("ct"))
    val p0 = purchases.select(col("user_id").as("pu"), col("t").as("pt"))
    val c = capPerWindow.map(capCandidates(c0, "cu", "ct", windowSec, _)).getOrElse(c0)
    val p = capPerWindow.map(capCandidates(p0, "pu", "pt", windowSec, _)).getOrElse(p0)
    val withClick = views
      .join(c,
        col("user_id") === col("cu") &&
        col("ct") > col("t") && col("ct") <= col("t") + windowSec, "left")
      .groupBy("user_id", "event_id", "t")
      .agg(min("ct").as("click_t"))
    withClick
      .join(p,
        col("user_id") === col("pu") &&
        col("pt") > col("click_t") && col("pt") <= col("click_t") + windowSec, "left")
      .groupBy("user_id", "event_id", "t", "click_t")
      .agg(min("pt").as("purchase_t"))
  }
}
