package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregations (SURVEY §2 H2) — the streaming
  * form of the audience roll-ups: tumbling/sliding event-time windows
  * with late-data cutoff. The same plan runs on a batch frame (see
  * q_stream_batch_parity) because Structured Streaming reuses the
  * batch aggregation physical operators per micro-batch.
  */
object StreamAggregates {

  /** Tumbling-window event counts + measure sum per key.
    * `df` needs (tsCol: timestamp, keyCol, valueCol: numeric). */
  def tumblingCounts(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      valueCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    src
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(
        count(lit(1)).as("events"),
        sum(floor(col(valueCol)).cast("long")).as("value_sum"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("events"), col("value_sum"))
  }

  /** Sliding-window weighted reach: distinct keys are approximated
    * with HLL++ (approx_count_distinct) — the only streaming-safe
    * distinct at scale; exactness is the batch path's job. */
  def slidingReach(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      hhCol: String,
      windowLength: String = "2 hours",
      slide: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (df.isStreaming) df.withWatermark(tsCol, watermark) else df
    src
      .groupBy(window(col(tsCol), windowLength, slide), col(keyCol))
      .agg(approx_count_distinct(col(hhCol)).as("approx_reach"))
      .select(
        col("window.start").as("window_start"),
        col(keyCol), col("approx_reach"))
  }
}
