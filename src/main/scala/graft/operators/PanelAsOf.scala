package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** As-of panel assignment (reference: etl-ddl-backfill.sql:64-90,
  * `events_with_panel`): each event gets
  * `MAX(panel_monday) WHERE metadata_date BETWEEN window_start AND
  * window_end` — the latest panel whose coverage window contains the
  * event's date.
  *
  * The reference expresses this as a correlated subquery per row. A
  * naive Spark translation is a range join (fact × windows) followed by
  * a per-event groupBy — which SHUFFLES THE FACT TABLE, a disaster at
  * 100 TB. Instead we exploit that the window table is tiny (one row
  * per panel week): explode each window into its covered dates and
  * pre-aggregate `date -> max(panel_monday)` ON THE SMALL SIDE, then
  * broadcast-equi-join the fact on its date column. The fact side never
  * shuffles and never duplicates rows.
  */
object PanelAsOf {

  /** windows: (panel_monday, window_start, window_end) → one row per
    * covered date with the winning (max) panel_monday. */
  def dateMap(windows: DataFrame): DataFrame =
    windows
      .select(
        explode(sequence(col("window_start"), col("window_end"))).as("covered_date"),
        col("panel_monday"))
      .groupBy("covered_date")
      .agg(max("panel_monday").as("panel_monday"))

  /** Adds `panel_monday` to `events` (left join: events outside every
    * window get NULL, which downstream filters drop — reference
    * etl-ddl-backfill.sql:113 `WHERE e.panel_monday IS NOT NULL`). */
  def assign(events: DataFrame, windows: DataFrame, dateCol: String): DataFrame =
    events.join(
      broadcast(dateMap(windows)),
      events(dateCol) === col("covered_date"),
      "left")
      .drop("covered_date")

  /** Panel coverage windows from distinct panel Mondays (reference:
    * etl-ddl-backfill.sql:1-10): [monday-28d, monday-1d]. */
  def windows(panelMondays: DataFrame): DataFrame =
    panelMondays.select(
      col("panel_monday"),
      date_sub(col("panel_monday"), 28).as("window_start"),
      date_sub(col("panel_monday"), 1).as("window_end"))
}
