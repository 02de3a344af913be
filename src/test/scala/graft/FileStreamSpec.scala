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
}
