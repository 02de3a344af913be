package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream equi-join with an event-time interval bound — the
  * enrichment join of two live feeds (e.g. raw exposures ⋈ weight
  * updates) where neither side fits in memory and rows must expire.
  *
  * Both sides are watermarked and the join condition bounds the right
  * timestamp to [left - before, left + after]: that interval plus the
  * watermarks is what lets Spark discard buffered state — an
  * unbounded-time stream join would hold both streams forever. State
  * per key is O(events inside the interval), independent of stream
  * length; at cluster scale both sides hash-partition on the key, so
  * the join is co-located and shuffle-once per side.
  */
object StreamJoin {

  def intervalJoin(
      left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      watermark: String, before: String, after: String): DataFrame = {
    val l = left.withWatermark(leftTime, watermark).alias("l")
    val r = right.withWatermark(rightTime, watermark).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTime") >= col(s"l.$leftTime") - expr(s"INTERVAL $before") &&
        col(s"r.$rightTime") <= col(s"l.$leftTime") + expr(s"INTERVAL $after"))
  }
}
