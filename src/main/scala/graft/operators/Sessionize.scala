package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (reference: etl-ddl-backfill.sql:119-186,
  * `viewing_sessions`): within each key group ordered by start time,
  * a new session starts when the gap from the previous event's end
  * exceeds `gapSeconds` (or there is no previous event); the session id
  * is the running count of breaks; sessions aggregate min(start),
  * max(end), sum(duration) and keep only sessions with
  * total duration >= `minSessionSeconds`.
  *
  * Scale: all three window passes (LAG, running SUM) and the final
  * aggregate share the same `partitionBy(keys)` hash partitioning, so
  * Spark plans ONE exchange on the session keys followed by a single
  * sort — the groupBy reuses the exchange because the grouping columns
  * are a superset of the window partition keys (verified via
  * .explain: one Exchange, one Sort, two Window nodes, partial agg).
  *
  * Determinism: the reference orders by start ts alone
  * (etl-ddl-backfill.sql:139); ties would make LAG ambiguous, so
  * callers pass `tieBreakers` (e.g. end ts + a unique event id) to fix
  * a total order. With a unique total order the default RANGE window
  * frame and ROWS frame agree.
  */
object Sessionize {

  /** Adds `gap_seconds`, `session_break`, `session_id` to `df`. */
  def mark(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      gapSeconds: Long,
      tieBreakers: Seq[String]): DataFrame = {
    val order: Seq[Column] = (startCol +: tieBreakers).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("gap_seconds", col(startCol) - lag(col(endCol), 1).over(w))
      .withColumn(
        "session_break",
        when(col("gap_seconds").isNull || col("gap_seconds") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum("session_break").over(w))
  }

  /** Full operator: mark + aggregate + minimum-duration filter.
    * `groupCols` must functionally depend on (keys, session_id) rows the
    * way the reference's GROUP BY does (etl-ddl-backfill.sql:162-183). */
  def sessions(
      df: DataFrame,
      keys: Seq[String],
      startCol: String,
      endCol: String,
      durationCol: String,
      gapSeconds: Long = 300L,
      minSessionSeconds: Long = 180L,
      // no default: ties in startCol make LAG/running-sum ambiguous, so a
      // caller must consciously supply a total order (e.g. end + unique id)
      tieBreakers: Seq[String],
      groupCols: Seq[String] = Seq.empty): DataFrame = {
    val marked = mark(df, keys, startCol, endCol, gapSeconds, tieBreakers)
    val grouping = (keys ++ groupCols :+ "session_id").distinct
    marked
      .groupBy(grouping.map(col): _*)
      .agg(
        min(startCol).as("session_start_ts"),
        max(endCol).as("session_end_ts"),
        sum(durationCol).as("total_duration"))
      .filter(col("total_duration") >= minSessionSeconds)
  }
}
