package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.functions.TextFunctions

/** The corpus-hygiene stages (PII scrub, quality gate) are stateless
  * projections, so the SAME column expressions run unchanged under
  * Structured Streaming — documents arriving on a stream are scrubbed
  * and gated with batch-identical results. This is the streaming
  * ingestion shape of a training-data pipeline: gate at arrival time,
  * not in a nightly sweep. */
class StreamCorpusSpec extends SparkTestBase {

  private def gate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col("doc_id"), col("text"),
        TextFunctions.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        TextFunctions.piiScrub(col("text")).as("scrubbed"),
        size(col("toks")).cast("long").as("n_tokens"),
        TextFunctions.langIdFromTokens(col("toks")).as("lang"))
      .withColumn("keep", col("n_tokens") >= 3 && col("lang") === "en")

  test("PII scrub + gate: identical expressions, batch-parity on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat is on the mat and happy"),
      (2L, "contact bob@corp.example.com about the offer in the morning"),
      (3L, "el la de que y en los"),
      (4L, "ok"))
    val input = MemoryStream[(Long, String)]
    val streamed = gate(input.toDF().toDF("doc_id", "text"))
    val query = streamed.writeStream
      .format("memory").queryName("gate_out").outputMode(OutputMode.Append).start()
    try {
      input.addData(docs.take(2): _*)
      query.processAllAvailable()
      input.addData(docs.drop(2): _*)
      query.processAllAvailable()
      val stream = spark.table("gate_out").collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(4))).toMap
      val batch = gate(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(4))).toMap
      assert(stream == batch) // exact parity, both paths, all rows
      assert(!stream(2L)._1.contains("@") && stream(2L)._1.contains("<EMAIL>"))
      assert(stream(1L)._2 && stream(2L)._2) // english, long enough
      assert(!stream(3L)._2 && !stream(4L)._2) // spanish / too short
    } finally query.stop()
  }
}
