package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reach & frequency over sessionized viewing (reference:
  * etl-ddl-backfill.sql:188-218 `v_audience_metrics`): each session
  * contributes `panel_weight` as one weighted view; a household counts
  * once toward reach with its weight; duration is weight-scaled.
  *
  * Two-level aggregation: first collapse to one row per
  * (content, household) — map-side partial aggregation shrinks the
  * shuffle to |households × contents| — then aggregate per content.
  * Weighted reach needs the household collapse because a household with
  * many sessions must count once (the reference view exposes
  * `weighted_hh` per session and leaves the DISTINCT to the consumer).
  */
object AudienceMetrics {

  /** sessions must carry contentKeys ++ (hh_id, panel_weight,
    * total_duration). Output per content: weighted_views, households,
    * weighted_reach, weighted_duration, frequency (= views / reach). */
  def reachAndFrequency(sessions: DataFrame, contentKeys: Seq[String]): DataFrame = {
    val perHousehold = sessions
      .groupBy((contentKeys :+ "hh_id").map(col): _*)
      .agg(
        max("panel_weight").as("hh_weight"),
        count(lit(1)).as("hh_sessions"),
        sum("panel_weight").as("hh_weighted_views"),
        sum(col("total_duration") * col("panel_weight")).as("hh_weighted_duration"))
    perHousehold
      .groupBy(contentKeys.map(col): _*)
      .agg(
        sum("hh_weighted_views").as("weighted_views"),
        count(lit(1)).as("households"),
        sum("hh_weight").as("weighted_reach"),
        sum("hh_weighted_duration").as("weighted_duration"),
        // frequency = weighted views per unit of weighted reach — both
        // in panel-weight units (reference v_audience_metrics exposes
        // weighted_view / weighted_hh for exactly this ratio).
        (sum("hh_weighted_views").cast("double") /
          nullif(sum("hh_weight"), lit(0)).cast("double")).as("frequency"))
  }
}
