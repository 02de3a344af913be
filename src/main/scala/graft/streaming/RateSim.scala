package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

import StreamSessionize.Exposure

/** Kafka-shaped live-source simulation: Spark's `rate` family of
  * sources mapped to viewing exposures with BOUNDED OUT-OF-ORDER
  * event time — the arrival contract a watermarked topic consumer
  * actually sees (monotone offsets, event time lagging arrival by at
  * most the producer/broker disorder bound).
  *
  * The mapping is a pure function of the rate source's `value`
  * (offset), so runs are deterministic and replayable: key cardinality
  * is bounded (`nKeys` — state-size bounds are provable), arrival
  * order is offset order, and event time lags by a hash-derived
  * 0..`maxDelaySeconds` jitter. Any pipeline that is correct under
  * this stream (watermark ≥ the disorder bound) is correct under a
  * real topic with the same bound.
  */
object RateSim {

  /** offset → exposure. Consecutive offsets rotate through `nKeys`
    * keys, so one key's inter-arrival is `nKeys` seconds of event
    * time; with a sessionize gap below that, every event closes its
    * predecessor's session — closures flow continuously while state
    * holds exactly one open session per key. */
  def toExposure(value: Long, nKeys: Int, baseEpoch: Long,
      maxDelaySeconds: Long): Exposure = {
    val delay =
      if (maxDelaySeconds <= 0) 0L
      else Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(value.toString).toLong,
        maxDelaySeconds)
    val start = baseEpoch + value - delay
    // short exposures: with per-key inter-arrival nKeys seconds and
    // jitter up to maxDelaySeconds, the inter-event silence per key
    // swings around (nKeys - 2) ± jitter — a sessionize gap below that
    // sees genuine session breaks, not one endless chain
    Exposure.at(s"hh${value % nKeys}", start, start + 2L, 2L)
  }

  /** Wall-clock driven stream (`rate`, `rowsPerSecond`) — the
    * always-on deployment shape. */
  def exposures(spark: SparkSession, rowsPerSecond: Int, nKeys: Int,
      baseEpoch: Long, maxDelaySeconds: Long): Dataset[Exposure] =
    fromRate(
      spark.readStream.format("rate")
        .option("rowsPerSecond", rowsPerSecond).load(),
      nKeys, baseEpoch, maxDelaySeconds)

  /** Deterministic micro-batch stream (`rate-micro-batch`,
    * `rowsPerBatch`) — fixed rows per trigger, for tests and
    * reproducible load drives. */
  def exposuresPerBatch(spark: SparkSession, rowsPerBatch: Int, nKeys: Int,
      baseEpoch: Long, maxDelaySeconds: Long): Dataset[Exposure] =
    fromRate(
      spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPerBatch).load(),
      nKeys, baseEpoch, maxDelaySeconds)

  private def fromRate(rate: org.apache.spark.sql.DataFrame, nKeys: Int,
      baseEpoch: Long, maxDelaySeconds: Long): Dataset[Exposure] = {
    val spark = rate.sparkSession
    import spark.implicits._
    rate.select("value").as[Long]
      .map(toExposure(_, nKeys, baseEpoch, maxDelaySeconds))
  }
}
