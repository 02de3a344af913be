package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Mirrors the driver's t1 smoke: SparkEntry.entry on sf0.001 must
  * return rows. Run: sbt "runMain graft.Smoke". */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(10, truncate = false)
    println(s"[smoke] entry rows=$n " + (if (n > 0) "OK" else "EMPTY"))

    // Streaming surface: sessionize a live MemoryStream of the sf0.001
    // events feed and show the closed sessions.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    import graft.streaming.StreamSessionize
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val feed = Pipeline.weightedEvents(spark, "/root/testdata/sf0.001")
      .select(concat_ws("|", col("hh_id"), col("title"), col("content_id")).as("key"),
        col("exposure_start_ts").as("startTs"),
        col("exposure_end_ts").as("endTs"), col("duration"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, s0, e, d) => StreamSessionize.Exposure.at(k, s0, e, d) }
    val input = MemoryStream[StreamSessionize.Exposure]
    val q = StreamSessionize.sessions(input.toDS())
      .writeStream.format("memory").queryName("smoke_sessions")
      .outputMode(OutputMode.Append).start()
    input.addData(feed.toSeq: _*)
    q.processAllAvailable()
    // push the watermark far forward to flush open sessions
    val farFuture = 32503680000L // year 3000, safely past any event
    input.addData(StreamSessionize.Exposure.at("~flush", farFuture, farFuture, 1L))
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("smoke_sessions").filter(col("key") =!= "~flush")
    val sn = sessions.count()
    println(s"[smoke] streaming sessions=$sn " + (if (sn > 0) "OK" else "EMPTY"))

    // Orchestration surface: the reference's daily task graph,
    // materializing each stage table (etl-dag.sql equivalent).
    val dagOut = java.nio.file.Files.createTempDirectory("smoke_dag").toString
    val results = graft.operators.TaskDag.run(
      spark, Pipeline.dailyDag("/root/testdata/sf0.001", dagOut))
    results.foreach(r => println(
      f"[smoke] dag task ${r.name}%-17s ${if (r.ok) "OK" else "FAIL: " + r.error.getOrElse("")} (${r.seconds}%.1fs)"))
    val dagSessions = spark.read.parquet(s"$dagOut/viewing_sessions").count()
    println(s"[smoke] dag sessions=$dagSessions " + (if (dagSessions > 0) "OK" else "EMPTY"))
    spark.stop()
  }
}
