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
}
