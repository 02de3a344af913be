package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.StreamJoin

class StreamJoinSpec extends SparkTestBase {

  test("stream-static enrichment join broadcasts the dim to every micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq(("view", 1.0), ("click", 2.0)).toDF("event_type", "weight")
    val input = MemoryStream[(java.sql.Timestamp, String, Long)]
    val joined = input.toDF().toDF("ts", "event_type", "n")
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq("event_type"))
      .selectExpr("n", "n * weight AS weighted")
    val q = joined.writeStream.format("memory").queryName("ss_out")
      .outputMode(OutputMode.Append).start()
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      input.addData(
        (ts("2024-01-01 10:00:00"), "view", 10L),
        (ts("2024-01-01 10:00:01"), "click", 5L),
        (ts("2024-01-01 10:00:02"), "unknown", 7L)) // no dim row -> dropped
      q.processAllAvailable()
      val rows = spark.table("ss_out").as[(Long, Double)].collect().toSet
      assert(rows == Set((10L, 10.0), (5L, 10.0)), s"got $rows")
    } finally q.stop()
  }

  test("stream-stream interval join matches within the bound, not outside") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val exposures = MemoryStream[(java.sql.Timestamp, String, Long)]
    val weights = MemoryStream[(java.sql.Timestamp, String, Double)]
    val joined = StreamJoin.intervalJoin(
      exposures.toDF().toDF("ets", "k", "ev"),
      weights.toDF().toDF("wts", "k", "w"),
      key = "k", leftTime = "ets", rightTime = "wts",
      watermark = "10 minutes", before = "5 minutes", after = "1 minute")
      .select("ev", "w")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append).start()
    try {
      exposures.addData(
        (ts("2024-01-01 10:10:00"), "a", 1L),
        (ts("2024-01-01 10:10:00"), "b", 2L))
      weights.addData(
        (ts("2024-01-01 10:08:00"), "a", 0.5), // inside [-5m, +1m]
        (ts("2024-01-01 10:10:30"), "a", 0.7), // inside (30s after)
        (ts("2024-01-01 10:02:00"), "a", 0.9), // too old
        (ts("2024-01-01 10:15:00"), "b", 1.5)) // too new
      q.processAllAvailable()
      val rows = spark.table("sj_out").as[(Long, Double)].collect().toSet
      assert(rows == Set((1L, 0.5), (1L, 0.7)),
        s"only in-interval matches must join; got $rows")
    } finally q.stop()
  }
}
