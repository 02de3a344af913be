package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the stream form of dedup_exact: drop rows
  * whose content hash was already seen, with bounded state.
  *
  * `dropDuplicatesWithinWatermark` keeps one state entry per key and
  * expires it once the event-time watermark passes the entry's time
  * plus the delay — the only way streaming dedup stays O(window)
  * instead of O(stream) in state. At-least-once sources re-deliver
  * within the watermark window by construction, so expired state
  * cannot re-admit a duplicate that the source still might resend.
  */
object StreamDedup {

  /** Content-hash a set of columns into a stable dedup key. */
  def contentKey(cols: Column*): Column = md5(to_json(struct(cols: _*)))

  /** @param df        streaming DataFrame with an event-time column
    * @param timeCol   watermarked event-time column name
    * @param delay     watermark delay, e.g. "10 minutes"
    * @param keyCols   identity columns (the dedup key) */
  def dedup(df: DataFrame, timeCol: String, delay: String, keyCols: String*): DataFrame =
    df.withColumn("__dedup_key", contentKey(keyCols.map(col): _*))
      .withWatermark(timeCol, delay)
      .dropDuplicatesWithinWatermark("__dedup_key")
      .drop("__dedup_key")
}
