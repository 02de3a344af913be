package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamPplBuckets
import graft.sources.ViewingData

/** F35 (`corpus_ppl_buckets`) as a foreachBatch loop — the
  * streamed == batch contract under a FIXED calibration artifact,
  * the boundary-recalibration discipline, replay convergence across
  * a recalibration, and bounded state dirs. */
class StreamPplBucketsSpec extends SparkTestBase {

  private def docs = ViewingData.table(spark, Sf, "documents")
    .select("doc_id", "text")

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "logprob", "n_tokens", "bucket")
      .collect().map(_.toString).toSet

  private def paths() = {
    val base = java.nio.file.Files.createTempDirectory("pplstream").toString
    (s"$base/art", s"$base/state", s"$base/pool", s"$base/out")
  }

  test("fixed artifact: streamed buckets == the oracled F35 row over the seed corpus") {
    val (art, state, pool, out) = paths()
    // seed on the WHOLE corpus, then stream the same corpus through in
    // 3 batches with recalibration never due: the artifact is exactly
    // what the registry row derives in-plan (same freq chain, same
    // capped thresholds), so the union of streamed buckets must equal
    // the F35 row bit-for-bit (6-dp logprobs inclusive)
    StreamPplBuckets.seed(docs, state, pool, art)
    val sink = StreamPplBuckets.scoreThenAppendParquet(
      art, state, pool, out, recalibrateEvery = 1000) _
    (0 until 3).foreach(i => sink(docs.filter(col("doc_id") % 3 === i), i.toLong))
    val streamed = rowSet(spark.read.parquet(out).drop("batch"))
    val batchRow = rowSet(SparkEntry.queries("corpus_ppl_buckets")(spark, Sf))
    assert(streamed.nonEmpty && streamed == batchRow,
      s"missing=${(batchRow -- streamed).take(3)} extra=${(streamed -- batchRow).take(3)}")
  }

  test("recalibration folds drifted state; replay across it converges; dirs bounded") {
    val (art, state, pool, out) = paths()
    val seedDocs = docs.filter(col("doc_id") % 2 === 0)
    StreamPplBuckets.seed(seedDocs, state, pool, art)
    val thBefore = spark.read.parquet(s"$art/th")
      .orderBy("rn").collect().map(_.getDouble(1)).toSeq
    // drifted traffic: a vocabulary the seed corpus never saw, heavy
    // enough to move the LM when folded in
    import spark.implicits._
    val drift = (0 until 400).map { i =>
      (1000000L + i * 10L, "zyx qqwx zzfuro qqwx zyx plomb " * 3)
    }.toDF("doc_id", "text")
    val sink = StreamPplBuckets.scoreThenAppendParquet(
      art, state, pool, out, recalibrateEvery = 2, compactEvery = 1) _
    sink(drift.filter(col("doc_id") % 20 === 0), 0L)
    sink(drift.filter(col("doc_id") % 20 === 10), 1L)
    // batch 0/1 scored under the SEED artifact: drift docs are
    // all-OOV there, so they are absent from those outputs
    assert(spark.read.parquet(s"$out/batch=0").count() == 0,
      "all-OOV docs score nothing under the seed LM")
    // batch 2 crosses the boundary: recalibration folds batches 0-1
    // (NOT 2), so the drift vocabulary enters the LM and batch 2's
    // drift docs now score
    val batch2 = docs.filter(col("doc_id") % 2 === 1).limit(50)
    sink(batch2, 2L)
    val thAfter = spark.read.parquet(s"$art/th")
      .orderBy("rn").collect().map(_.getDouble(1)).toSeq
    assert(thAfter != thBefore, "recalibration must move the thresholds")
    val out2 = rowSet(spark.read.parquet(s"$out/batch=2"))
    // replay batch 2 (crash window: artifact republished, state
    // appended, commit lost) — the rebuild excludes batch 2's own
    // state rows, so the replay scores under the identical artifact
    sink(batch2, 2L)
    assert(rowSet(spark.read.parquet(s"$out/batch=2")) == out2,
      "replay across the recalibration boundary must converge")
    val thReplay = spark.read.parquet(s"$art/th")
      .orderBy("rn").collect().map(_.getDouble(1)).toSeq
    assert(thReplay == thAfter, "replayed recalibration rebuilds identically")
    // compaction keeps both state stores bounded
    Seq(state, pool).foreach { p =>
      val dirs = new java.io.File(p).listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(dirs.size <= 3 && dirs.contains("batch=-1"),
        s"state dirs must stay bounded at $p, got $dirs")
    }
    // the id-space split holds for both stores
    intercept[IllegalArgumentException] {
      StreamPplBuckets.TokState.append(
        spark.range(1).selectExpr("'a' as tok", "1.0d as c"),
        state, StreamPplBuckets.TokState.SeedBatchId)
    }
  }
}
