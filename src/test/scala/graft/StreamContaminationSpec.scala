package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamContamination
import graft.sources.ViewingData

/** F36 (`text_contamination_report`) as a foreachBatch monitor — the
  * streamed == batch contract: the accumulated report over a
  * multi-batch train split equals the ORACLED batch row outright
  * (matching is monotone), re-delivery converges, and the in-loop
  * compaction keeps the state dir count bounded. */
class StreamContaminationSpec extends SparkTestBase {

  private def docs = ViewingData.table(spark, Sf, "documents")
    .select("doc_id", "text")

  private def reportSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "n_grams", "leaked_grams", "leak_pct", "severity")
      .collect().map(_.toString).toSet

  test("streamed report == the oracled batch row; replay converges; dirs bounded") {
    val base = java.nio.file.Files.createTempDirectory("contamstream").toString
    val state = s"$base/state"
    val testG = StreamContamination.testGramRows(
      docs.filter(col("doc_id") % 97 === 0)).localCheckpoint()
    val sink = StreamContamination
      .probeThenAppendParquet(testG, state, compactEvery = 1) _
    val train = docs.filter(col("doc_id") % 97 =!= 0)
    val parts = (0 until 3).map(i => train.filter(col("doc_id") % 3 === i))
    parts.zipWithIndex.foreach { case (p, i) => sink(p, i.toLong) }
    val expected = reportSet(
      SparkEntry.queries("text_contamination_report")(spark, Sf))
    val got = reportSet(StreamContamination.report(spark, state, testG))
    assert(got.nonEmpty && got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    // some doc must actually be contaminated or the parity is vacuous
    assert(expected.exists(_.contains("leaked") || expected.exists(_.contains("partial"))),
      s"fixture must contain real leaks: $expected")
    // crash-window replay: batch 2's append + compaction ran, the
    // commit didn't — the re-delivered batch overwrites its own dir
    sink(parts(2), 2L)
    assert(reportSet(StreamContamination.report(spark, state, testG)) == expected,
      "replay across a compaction must converge")
    val dirs = new java.io.File(state).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs.size <= 2 && dirs.contains("batch=-1"),
      s"state dir count must stay bounded, got $dirs")
    // state is bounded by the BENCHMARK, not the stream: every state
    // row is a test (doc_id, gram) pair
    val stateRows = spark.read.parquet(state).drop("batch").distinct()
    val testPairs = testG.select("doc_id", "gram").distinct()
    assert(stateRows.join(testPairs, Seq("doc_id", "gram"), "left_anti").count() == 0,
      "state must be a subset of the test gram table")
  }
}
