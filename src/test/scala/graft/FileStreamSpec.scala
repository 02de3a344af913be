package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._

import graft.streaming.StreamAggregates

/** The streaming SOURCE surface: the same parquet stage the batch
  * pipeline reads, consumed via readStream with the identical
  * aggregation — results must match the batch run exactly once the
  * watermark has flushed (stream/batch unification). */
class FileStreamSpec extends SparkTestBase {

  test("parquet file stream → watermarked tumbling agg == batch result") {
    val dir = Files.createTempDirectory("filestream").toString
    Files.copy(
      Paths.get(s"$Sf/events.parquet"),
      Paths.get(s"$dir/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = new StructType()
      .add("event_id", LongType).add("ts", LongType).add("user_id", LongType)
      .add("event_type", StringType).add("value", DoubleType).add("props", StringType)
    def fix(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

    val stream = fix(spark.readStream.schema(schema).parquet(dir))
    val q = StreamAggregates.tumblingCounts(stream, "ts", "event_type", "value",
      windowLength = "6 hours", watermark = "1 hour")
      .writeStream.format("memory").queryName("fs_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fs_out")
        .select(col("window_start").cast("string"), col("event_type"),
          col("events"), col("value_sum"))
        .as[(String, String, Long, Long)](org.apache.spark.sql.Encoders.product)
        .collect().toSet
      val batch = StreamAggregates.tumblingCounts(
        fix(spark.read.schema(schema).parquet(dir)), "ts", "event_type", "value",
        windowLength = "6 hours")
        .select(col("window_start").cast("string"), col("event_type"),
          col("events"), col("value_sum"))
        .as[(String, String, Long, Long)](org.apache.spark.sql.Encoders.product)
        .collect().toSet
      assert(streamed == batch, s"stream ${streamed.size} rows vs batch ${batch.size}")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stop/restart with checkpoint: sessionize→merge-sink recovers exactly-once") {
    import graft.streaming.{MergeSink, StreamSessionize}
    import graft.streaming.StreamSessionize.Exposure
    import spark.implicits._
    val root = Files.createTempDirectory("restart").toString
    val in = s"$root/in"; val ckpt = s"$root/ckpt"; val target = s"$root/sessions"
    new java.io.File(in).mkdirs()
    // the file source expects FLAT data files under the watched dir
    def land(name: String, rows: Exposure*): Unit = {
      val tmp = s"$root/tmp_$name"
      rows.toDS().coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$in/$name.parquet"))
    }
    // one file per trigger so the watermark advances batch-over-batch
    // (Spark sets each batch's watermark from the PREVIOUS batch's max
    // event time minus the delay); event times only increase, since a
    // restored watermark drops older arrivals
    def start() = StreamSessionize
      .sessions(spark.readStream.schema(implicitly[org.apache.spark.sql.Encoder[Exposure]].schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in).as[Exposure],
        gapSeconds = 300L, minSessionSeconds = 100L, watermarkDelay = "10 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", ckpt)
      .foreachBatch(
        (b: org.apache.spark.sql.Dataset[StreamSessionize.ClosedSession], id: Long) =>
          MergeSink.insertOnlyParquet(target, Seq("key", "sessionStart"))(b.toDF(), id))
      .start()

    // run 1: hh1's session completes (timeout due at 1600) but the
    // watermark only reaches 1990 AFTER the pusher's batch — the query
    // stops with hh1 parked in the state store
    land("f1", Exposure.at("hh1", 1000L, 1100L, 150L),
      Exposure.at("hh1", 1200L, 1300L, 100L))
    land("f2", Exposure.at("zz1", 2000L, 2001L, 1L))
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()

    // run 2 resumes the SAME checkpoint with f1/f2 still in the dir:
    // offsets must skip them, the restored state+watermark must close
    // hh1 in the first new batch, and hh2 closes once f5 pushes past
    // its timeout
    land("f3", Exposure.at("hh2", 2500L, 2700L, 200L))
    land("f4", Exposure.at("zz2", 5000L, 5001L, 1L))
    land("f5", Exposure.at("zz3", 9000L, 9001L, 1L))
    val q2 = start()
    try { q2.processAllAvailable() } finally q2.stop()

    val got = spark.read.parquet(target)
      .select("key", "sessionStart", "totalDuration")
      .as[(String, Long, Long)].collect().toSet
    assert(got.contains(("hh1", 1000L, 250L)),
      s"session from restored pre-restart state lost: $got")
    assert(got.contains(("hh2", 2500L, 200L)), s"post-restart session missing: $got")
    // exactly-once across the restart boundary: one row per session key
    val dups = spark.read.parquet(target)
      .groupBy("key", "sessionStart").count().filter(col("count") > 1).count()
    assert(dups == 0, "restart must not duplicate sessions")
  }
}
