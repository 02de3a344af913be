package graft

import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{RateSim, StreamSessionize}

/** Drives the streaming sessionizer from the rate-limited simulated
  * source (SURVEY §8: Kafka-shaped source sim) and proves the
  * watermark actually BOUNDS state: across many micro-batches of
  * out-of-order events, the state store plateaus at one open session
  * per key instead of growing with the stream. */
class RateSimSpec extends SparkTestBase {

  test("out-of-order rate stream: state plateaus at nKeys while output grows") {
    val nKeys = 8
    val maxDelay = 20L
    // per-key silence swings around (nKeys-2)=6s ± 20s jitter, so a 5s
    // gap sees both chains and breaks — sessions close continuously
    val src = RateSim.exposuresPerBatch(spark, rowsPerBatch = 200,
      nKeys = nKeys, baseEpoch = 1700000000L, maxDelaySeconds = maxDelay)
    assert(src.isStreaming)
    val sessions = StreamSessionize.sessions(src,
      gapSeconds = 5L, minSessionSeconds = 2L,
      watermarkDelay = "40 seconds") // ≥ the disorder bound → no late drops
    val q = sessions.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ratesim").start()
    try {
      // let ≥5 micro-batches run (rate-micro-batch emits 200 rows per
      // trigger, deterministically)
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      while (q.recentProgress.count(_.numInputRows > 0) < 5 &&
             System.nanoTime() < deadline) Thread.sleep(100)
      val progress = q.recentProgress.filter(_.numInputRows > 0)
      assert(progress.length >= 5, s"only ${progress.length} batches ran")

      // state growth is watermark-bounded: once the first batches have
      // populated every key, numRowsTotal plateaus at ≤ nKeys (one
      // open session per key) — it must NOT track total rows seen
      val stateRows = progress.map(_.stateOperators.head.numRowsTotal)
      val settled = stateRows.drop(2)
      assert(settled.forall(_ <= nKeys),
        s"state must plateau at ≤$nKeys open sessions: ${stateRows.toSeq}")
      // while the processed row count keeps growing batch over batch
      val processed = progress.map(_.numInputRows).sum
      assert(processed >= 5 * 200, s"source must keep producing: $processed")

      // the disorder is real AND bounded: construction check on the
      // shared offset→event mapping
      val starts = (0L until 400L)
        .map(RateSim.toExposure(_, nKeys, 1700000000L, maxDelay).startTs)
      assert(starts.sliding(2).exists(w => w.last < w.head),
        "stream must contain out-of-order event times")
      assert(starts.zipWithIndex.forall { case (s, i) =>
        s > 1700000000L + i - maxDelay && s <= 1700000000L + i },
        "disorder must stay within the declared bound")

      // and sessions actually closed (output flows, not just state).
      // NOTE: no processAllAvailable() here — a rate source always has
      // more data "available", so that call never returns; ≥5 batches
      // of 200 rows with a 5 s gap guarantee closures already landed.
      assert(spark.table("ratesim").count() > 0, "no sessions emitted")
    } finally q.stop()
  }
}
