package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AudienceMetrics, IncrementalMerge, PanelAsOf, Sessionize}
import graft.sources.ViewingData

/** The reference's full ETL DAG (etl-ddl-backfill.sql), composed from
  * the operator library: normalize → union sources → panel as-of →
  * weight join → sessionize → audience metrics. Each stage is a pure
  * DataFrame transform so the whole DAG is one Catalyst plan — filters
  * and pruning flow through every stage into the two parquet scans.
  */
object Pipeline {

  /** The reference's raw_viewing_events width (etl-ddl-backfill.sql:
    * 16-62): content metadata + geo + partition columns ride the union
    * so every downstream stage can slice by them. */
  val ViewingCols: Seq[String] = Seq(
    "source_table", "event_id", "smba_id", "content_id", "title",
    "application", "content_type", "episode_title", "season", "episode",
    "network", "zip", "yyyy", "mm", "dd",
    "duration", "exposure_start_ts", "exposure_end_ts",
    "dma", "metadata_date")

  /** raw_viewing_events (etl-ddl-backfill.sql:16-62): ACR ∪ STB with a
    * source tag; STB lacks `application`. */
  def viewingEvents(spark: SparkSession, dir: String): DataFrame = {
    val a = ViewingData.acr(spark, dir)
      .withColumn("source_table", lit("ACR"))
      .select(ViewingCols.map(col): _*)
    val s = ViewingData.stb(spark, dir)
      .withColumn("source_table", lit("STB"))
      .withColumn("application", lit(null).cast("string"))
      .select(ViewingCols.map(col): _*)
    a.unionByName(s)
  }

  def panelWindows(spark: SparkSession, dir: String): DataFrame =
    PanelAsOf.windows(ViewingData.panelMondays(spark, dir))

  /** events_with_panel: as-of panel assignment via broadcast date map. */
  def withPanel(spark: SparkSession, dir: String): DataFrame =
    PanelAsOf.assign(viewingEvents(spark, dir), panelWindows(spark, dir), "metadata_date")

  /** weighted_events (etl-ddl-backfill.sql:91-117): join weekly weights
    * on (member, panel monday); drop events without panel/household/
    * weight. Weights ≪ events → broadcast join, no fact shuffle.
    * Frame-level so incremental/DAG runs can feed MATERIALIZED
    * upstream tables instead of re-deriving them. */
  def weightedFrom(viewing: DataFrame, windows: DataFrame, weights: DataFrame): DataFrame = {
    val g = weights.withColumnRenamed("metadata_date", "g_date")
    val e = PanelAsOf.assign(viewing, windows, "metadata_date")
    e.join(
        broadcast(g),
        e("smba_id") === g("smba_id") && col("panel_monday") === g("g_date"),
        "left")
      .drop(g("smba_id")).drop("g_date")
      .filter(
        col("panel_monday").isNotNull &&
        col("hh_id").isNotNull &&
        col("geo_weight").isNotNull)
      .withColumnRenamed("geo_weight", "panel_weight")
  }

  def weightedEvents(spark: SparkSession, dir: String): DataFrame =
    weightedFrom(
      viewingEvents(spark, dir),
      panelWindows(spark, dir),
      ViewingData.geoWeights(spark, dir))

  val SessionKeys: Seq[String] = Seq("hh_id", "title", "content_id")
  val SessionGroupCols: Seq[String] =
    Seq("dma", "source_table", "application", "panel_monday", "panel_weight")
  val SessionOutCols: Seq[String] = Seq(
    "hh_id", "dma", "source_table", "application", "title", "content_id",
    "panel_monday", "session_id", "panel_weight",
    "session_start_ts", "session_end_ts", "total_duration")

  /** viewing_sessions (etl-ddl-backfill.sql:119-186). Tie-break the
    * reference's ORDER BY exposure_start_ts with (end, member, event id)
    * for a deterministic total order. */
  def sessions(weighted: DataFrame): DataFrame =
    Sessionize.sessions(
      weighted,
      keys = SessionKeys,
      startCol = "exposure_start_ts",
      endCol = "exposure_end_ts",
      durationCol = "duration",
      gapSeconds = 300L,
      minSessionSeconds = 180L,
      tieBreakers = Seq("exposure_end_ts", "smba_id", "event_id"),
      groupCols = SessionGroupCols)
      .select(SessionOutCols.map(col): _*)

  def sessions(spark: SparkSession, dir: String): DataFrame =
    sessions(weightedEvents(spark, dir))

  /** v_audience_metrics rollup (etl-ddl-backfill.sql:188-218). */
  def audienceMetrics(spark: SparkSession, dir: String): DataFrame =
    AudienceMetrics.reachAndFrequency(sessions(spark, dir), Seq("title", "content_id"))

  /** Insert-only incremental merge demo (etl-dag.sql task_update_raw_events):
    * target = events at/before the watermark; batch = a re-delivered
    * overlapping slice; result = target + genuinely new rows. */
  /** The watermark is a control value (reference: task_control) — derive
    * it from a single-column scan of the raw feed, NOT from the derived
    * pipeline output, so the expensive subtree is never recomputed just
    * to find the cutoff date. */
  private def ingestWatermark(spark: SparkSession, dir: String): DataFrame =
    graft.sources.ViewingData.table(spark, dir, "events")
      .agg(max(to_date(col("ts"))).as("max_d"))

  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    // In the reference, MERGE reads a MATERIALIZED raw_viewing_events
    // table; the checkpoint mirrors that. Without it the cast-heavy
    // union subtree is instantiated at EVERY reference — target, batch,
    // and the anti-join's key-distinct side — 12 scans of the feed in
    // one plan (Prof `scans` sweep).
    val ve = viewingEvents(spark, dir).localCheckpoint()
    val maxD = broadcast(ingestWatermark(spark, dir))
    val target = ve.crossJoin(maxD)
      .filter(col("metadata_date") <= date_sub(col("max_d"), 7)).drop("max_d")
    val batch = ve.crossJoin(maxD)
      .filter(col("metadata_date") > date_sub(col("max_d"), 10)).drop("max_d")
    IncrementalMerge.insertOnly(target, batch, Seq("smba_id", "exposure_start_ts"))
  }

  /** Full upsert MERGE demo — beyond the reference's insert-only
    * task: the re-delivered slice carries RESTATED durations, so
    * matching keys must take the new values and only genuinely new
    * keys append. The batch here is a multi-DAY slice of the feed —
    * the bulk-backfill shape whose key set is NOT trigger-bounded —
    * so no broadcast hint is planted: AQE broadcasts the key set
    * while it fits and falls back to a shuffled anti join when a
    * backfill's keys would blow the driver. */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    // materialized-table mirror — see incrementalMerge
    val ve = viewingEvents(spark, dir).localCheckpoint()
    val maxD = broadcast(ingestWatermark(spark, dir))
    val target = ve.crossJoin(maxD)
      .filter(col("metadata_date") <= date_sub(col("max_d"), 7)).drop("max_d")
    val batch = ve.crossJoin(maxD)
      .filter(col("metadata_date") > date_sub(col("max_d"), 10)).drop("max_d")
      .withColumn("duration", col("duration") + 1000000L)
    IncrementalMerge.upsert(target, batch,
      Seq("smba_id", "exposure_start_ts"), Seq("event_id"),
      broadcastKeys = false)
  }

  /** Sessions-stage incremental rebuild (etl-dag.sql:92-120): recompute
    * sessions only for groups touched by the fresh slice. */
  def affectedRebuild(spark: SparkSession, dir: String): DataFrame = {
    // In the reference DAG the sessions stage reads the MATERIALIZED
    // weighted_events table; checkpointing mirrors that — without it
    // the cast-heavy union+join pipeline is instantiated twice (fresh
    // slice + full history) since the two subtrees differ and share no
    // exchange.
    val weighted = weightedEvents(spark, dir).localCheckpoint()
    val maxD = broadcast(ingestWatermark(spark, dir))
    // Only the fresh slice's (tiny, distinct) group keys feed the
    // broadcast semi join, so the full-history side is scanned once.
    val batch = weighted.crossJoin(maxD)
      .filter(col("metadata_date") > date_sub(col("max_d"), 5)).drop("max_d")
    val keys = IncrementalMerge.affectedKeys(batch, SessionKeys)
    sessions(weighted.join(broadcast(keys), SessionKeys, "left_semi"))
  }

  /** Control-table watermark (etl-dag.sql:125-140). */
  def watermark(spark: SparkSession, dir: String): DataFrame =
    IncrementalMerge.watermark(
      Seq(ViewingData.acr(spark, dir), ViewingData.stb(spark, dir)),
      "metadata_date")

  /** The full two-watermark control table (etl-dag.sql:126-145):
    * raw feeds gate on LEAST of their maxes; the panel feed advances
    * on its own. */
  def controlTable(spark: SparkSession, dir: String): DataFrame =
    IncrementalMerge.controlTable(
      Seq(ViewingData.acr(spark, dir), ViewingData.stb(spark, dir)),
      ViewingData.geoWeights(spark, dir),
      "metadata_date")

  /** Panel-windows incremental MERGE (etl-dag.sql:8-26
    * task_update_panel_windows): fresh Mondays past the panel
    * watermark insert-only-merged into the existing windows, keyed on
    * panel_monday. */
  def panelWindowsMerge(spark: SparkSession, dir: String): DataFrame = {
    // the windows table is referenced three times (existing, target
    // slice, overlapping batch) — materialize the tiny frame once
    // instead of re-deriving distinct Mondays from the feed per
    // reference (6 feed scans → 1; Prof `scans` sweep)
    val windows = panelWindows(spark, dir).localCheckpoint()
    val cutoff = broadcast(windows.agg(date_sub(max("panel_monday"), 14).as("cut")))
    val target = windows.crossJoin(cutoff)
      .filter(col("panel_monday") <= col("cut")).drop("cut")
    // the batch overlaps the target on purpose: MERGE must ignore
    // already-present Mondays
    val batch = windows.crossJoin(cutoff)
      .filter(col("panel_monday") > date_sub(col("cut"), 21)).drop("cut")
    IncrementalMerge.insertOnly(target, batch, Seq("panel_monday"))
  }

  /** The reference's daily task graph (etl-dag.sql): each stage
    * materializes its table (the reference MERGEs into Snowflake
    * tables; here each lands as parquet under `outDir`), wired with
    * the same AFTER dependencies. */
  def dailyDag(dir: String, outDir: String): Seq[operators.TaskDag.Task] = {
    import operators.TaskDag.Task
    def save(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    Seq(
      Task("kickoff", run = _ => ()),
      Task("panel_windows", Seq("kickoff"),
        s => save(panelWindows(s, dir), "panel_windows")),
      Task("raw_events", Seq("kickoff"),
        s => save(viewingEvents(s, dir), "raw_viewing_events")),
      Task("weighted_events", Seq("panel_windows", "raw_events"),
        s => save(
          weightedFrom(
            s.read.parquet(s"$outDir/raw_viewing_events"),
            s.read.parquet(s"$outDir/panel_windows"),
            ViewingData.geoWeights(s, dir)),
          "weighted_events")),
      Task("viewing_sessions", Seq("weighted_events"),
        s => save(sessions(s.read.parquet(s"$outDir/weighted_events")), "viewing_sessions")),
      Task("control_table", Seq("viewing_sessions"),
        s => save(watermark(s, dir), "task_control")))
  }
}
