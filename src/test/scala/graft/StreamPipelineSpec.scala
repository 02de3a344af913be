package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{MergeSink, StreamSessionize}
import graft.streaming.StreamSessionize.Exposure

/** End-to-end: live exposures → gap sessionization → idempotent
  * insert-only merge into a parquet target — the reference's whole
  * incremental DAG (etl-dag.sql) as ONE always-on streaming job
  * instead of scheduled MERGE tasks. */
class StreamPipelineSpec extends SparkTestBase {

  test("stream -> sessions -> merge sink lands exactly-once sessions in parquet") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val target = Files.createTempDirectory("streampipe").toString + "/sessions"
    val input = MemoryStream[Exposure]
    val sessions = StreamSessionize.sessions(
      input.toDS(), gapSeconds = 300L, minSessionSeconds = 180L)
    val q = sessions.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch(
        (batch: org.apache.spark.sql.Dataset[StreamSessionize.ClosedSession], id: Long) =>
          MergeSink.insertOnlyParquet(target, Seq("key", "sessionStart"))(batch.toDF(), id))
      .start()
    try {
      // session A closes via gap; the open tail flushes via watermark
      input.addData(
        Exposure.at("hh1", 1000L, 1100L, 200L),
        Exposure.at("hh1", 1200L, 1300L, 100L))
      q.processAllAvailable()
      input.addData(Exposure.at("hh1", 5000L, 5400L, 400L)) // closes A
      q.processAllAvailable()
      input.addData(Exposure.at("zz", 999999L, 999999L, 1L)) // watermark push
      q.processAllAvailable()
      val afterFirst = spark.read.parquet(target)
        .select("key", "sessionStart", "totalDuration")
        .as[(String, Long, Long)].collect().toSet
      assert(afterFirst.contains(("hh1", 1000L, 300L)), s"closed session missing: $afterFirst")
      assert(afterFirst.contains(("hh1", 5000L, 400L)), s"flushed session missing: $afterFirst")

      // re-delivery: feed the ALREADY-LANDED sessions through the sink
      // again (what a restarted query replaying a micro-batch does) —
      // the target must not grow or duplicate
      val landed = spark.read.parquet(target)
      val before = landed.count()
      MergeSink.insertOnlyParquet(target, Seq("key", "sessionStart"))(landed, 99L)
      val after = spark.read.parquet(target)
      assert(after.count() == before, "re-delivered batch must be a no-op")
      val counts = after.groupBy("key", "sessionStart").count()
        .filter(org.apache.spark.sql.functions.col("count") > 1).count()
      assert(counts == 0, "merge sink must keep one row per (key, sessionStart)")
    } finally q.stop()
  }

  test("crash mid-micro-batch: restart from checkpoint lands exactly-once") {
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("streamcrash").toString
    val target = root + "/sessions"
    val ckpt = root + "/ckpt"
    val keys = Seq("key", "sessionStart")
    val nKeys = 8
    // fires once per JVM: q1 dies on it, q2 (same JVM) sails past
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    def start() = {
      val src = graft.streaming.RateSim.exposuresPerBatch(spark,
        rowsPerBatch = 200, nKeys = nKeys,
        baseEpoch = 1700000000L, maxDelaySeconds = 20L)
      val sessions = StreamSessionize.sessions(src,
        gapSeconds = 5L, minSessionSeconds = 2L,
        watermarkDelay = "40 seconds")
      sessions.writeStream
        .outputMode(OutputMode.Append)
        .option("checkpointLocation", ckpt)
        .foreachBatch(
          (batch: org.apache.spark.sql.Dataset[StreamSessionize.ClosedSession], id: Long) => {
            MergeSink.insertOnlyParquet(target, keys)(batch.toDF(), id)
            // injected crash AFTER the data write, BEFORE Spark commits
            // the micro-batch offset — the worst-case window: data is
            // on disk but the batch WILL replay on restart
            if (id >= 2 && crashed.compareAndSet(false, true))
              throw new RuntimeException("injected mid-batch crash")
          })
        .start()
    }
    def deadline() = System.nanoTime() + 90L * 1000 * 1000 * 1000
    val q1 = start()
    val d1 = deadline()
    while (q1.isActive && System.nanoTime() < d1) Thread.sleep(100)
    assert(!q1.isActive, "query must die from the injected crash")
    assert(q1.exception.isDefined, "the termination must be the crash")
    val landedBeforeRestart = spark.read.parquet(target).count()
    assert(landedBeforeRestart > 0, "crashed run must have landed batches")

    val q2 = start()
    try {
      // restart replays the uncommitted batch, then advances new ones
      val d2 = deadline()
      while (q2.recentProgress.count(_.numInputRows > 0) < 3 &&
             System.nanoTime() < d2) Thread.sleep(100)
      assert(q2.recentProgress.count(_.numInputRows > 0) >= 3,
        "restarted query must make progress")
      // watermark recovered from the checkpoint, not reset to epoch:
      // the FIRST post-restart batch already carries a 2023+ watermark
      val firstWm = q2.recentProgress
        .filter(_.numInputRows > 0).head.eventTime.get("watermark")
      assert(firstWm != null && firstWm >= "2023",
        s"watermark must recover from checkpoint, got $firstWm")

      q2.stop()
      // exactly-once despite the replay: one row per key, and the
      // stream kept appending after the crash point
      val out = spark.read.parquet(target)
      val dups = out.groupBy("key", "sessionStart").count()
        .filter(col("count") > 1).count()
      assert(dups == 0,
        "replayed micro-batch must not duplicate sessions")
      assert(out.count() > landedBeforeRestart,
        "pipeline must keep producing after recovery")
      // state recovered: post-restart batches still hold ≤ nKeys open
      // sessions (the watermark bound), not a rebuilt-from-zero blowup
      val stateRows = q2.recentProgress.filter(_.numInputRows > 0)
        .map(_.stateOperators.head.numRowsTotal)
      assert(stateRows.forall(_ <= nKeys),
        s"recovered state must stay bounded: ${stateRows.toSeq}")
    } finally if (q2.isActive) q2.stop()
  }
}
