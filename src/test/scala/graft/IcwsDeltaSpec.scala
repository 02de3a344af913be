package graft

import org.apache.spark.sql.functions._

import graft.operators.{IcwsDelta, MinhashDelta}
import graft.sources.ViewingData

/** Incremental ICWS weighted dedup (D19's persisted-index form) — the
  * D10 discipline: the incremental result must EQUAL the full
  * dedup_icws recompute restricted to delta-touching pairs, the
  * persisted batch layout must be replay-idempotent, and the pruned
  * probe must match the unpruned one. */
class IcwsDeltaSpec extends SparkTestBase {

  private def docs = ViewingData.table(spark, Sf, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))

  private def corpus = docs.filter(col("doc_id") % 4 =!= 0)
  private def delta = docs.filter(col("doc_id") % 4 === 0)

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental == full dedup_icws recompute restricted to delta-touching pairs") {
    // full pipeline: the dedup_icws registry shape over ALL docs
    val full = SparkEntry.queries("dedup_icws")(spark, Sf)
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = pairSet(full).filter { case (a, b) => deltaIds(a) || deltaIds(b) }
    val got = pairSet(IcwsDelta.verifyExact(docs,
      IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
        IcwsDelta.bandRows(corpus, "doc_id", "text")), IcwsDelta.Tau))
    assert(got.nonEmpty, "the shape must actually find weighted near-dups")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the bulk-backfill path (no broadcast hint) is pair-identical
    val bulk = pairSet(IcwsDelta.verifyExact(docs,
      IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
        IcwsDelta.bandRows(corpus, "doc_id", "text"),
        broadcastDelta = false), IcwsDelta.Tau))
    assert(bulk == expected, "hint-free bulk path must match")
  }

  test("restricted verify == full-frame verify (the semi-join loses nothing)") {
    val cand = IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
      IcwsDelta.bandRows(corpus, "doc_id", "text")).localCheckpoint()
    val restricted = pairSet(IcwsDelta.verifyExact(docs, cand, IcwsDelta.Tau))
    val fullFrame = pairSet(QueriesML.weightedJaccardVerify(docs, cand, IcwsDelta.Tau))
    assert(restricted == fullFrame,
      "verify only reads tf rows of candidate ids — restriction must be invisible")
  }

  test("persisted index: batch layout round-trips; a replayed batch is a no-op") {
    val path = java.nio.file.Files.createTempDirectory("icwsidx").toString + "/idx"
    IcwsDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text", path, 0L)
    IcwsDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", path, 1L)
    val viaDisk = pairSet(IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
      IcwsDelta.readIndex(spark, path)))
    val viaMemory = pairSet(IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
      IcwsDelta.bandRows(corpus, "doc_id", "text")))
    assert(viaDisk == viaMemory, "disk index must probe identically")
    // replay batch 1 (at-least-once delivery): same rows, not doubled
    val before = IcwsDelta.readIndex(spark, path).count()
    IcwsDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", path, 1L)
    assert(IcwsDelta.readIndex(spark, path).count() == before,
      "replayed batch must overwrite its own partition, not append")
    intercept[IllegalArgumentException] {
      IcwsDelta.writeBatch(delta, "doc_id", "text", path, -1L)
    }
  }

  test("streaming probe-then-append: streamed candidates == batch incremental; replay converges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    val dirRoot = java.nio.file.Files.createTempDirectory("icwsstream").toString
    val (indexPath, pairsPath) = (s"$dirRoot/idx", s"$dirRoot/pairs")
    // seed the standing corpus OUTSIDE the stream's batch-id space —
    // structurally enforced: seeds must sit >= SeedBatchId, stream
    // appends must sit below it, so micro-batch 0 can never overwrite
    // the standing corpus (review finding)
    IcwsDelta.seedBatch(corpus, "doc_id", "text", indexPath)
    intercept[IllegalArgumentException] {
      IcwsDelta.seedBatch(corpus, "doc_id", "text", indexPath, seedId = 0L)
    }
    intercept[IllegalArgumentException] {
      IcwsDelta.writeBandRows(
        IcwsDelta.readIndex(spark, indexPath), indexPath, IcwsDelta.SeedBatchId)
    }
    val rows = delta.select("doc_id", "lang", "n_chars", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val (b1, b2) = rows.partition(_._1 % 8 == 0)
    val input = MemoryStream[(Long, String, Long, String)]
    val q = input.toDF().toDF("doc_id", "lang", "n_chars", "text").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch(graft.streaming.StreamWeightedDedup
        .probeThenAppendParquet(indexPath, pairsPath) _)
      .start()
    try {
      input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      def streamed() = spark.read.parquet(pairsPath)
        .select("id_a", "id_b").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val got = streamed()
      // batch yardstick: the one-shot incremental probe of the same
      // delta against the same standing corpus — pair sets must match
      // (within-delta pairs split across micro-batches are caught when
      // the LATER member arrives, because batch 1's rows are indexed
      // before batch 2 probes)
      val expected = pairSet(IcwsDelta.incrementalCandidates(
        delta, "doc_id", "text", IcwsDelta.bandRows(corpus, "doc_id", "text")))
      assert(got == expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      // re-delivery of batch 1's DATA (arrives as a NEW micro-batch;
      // same-batch-id replay idempotence is pinned by the writeBatch
      // test above): self-pairs are guarded, dup pairs fold in distinct
      input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      assert(streamed() == expected, "replay must converge")
    } finally q.stop()
  }

  test("compacted + pruned probe == unpruned probe; appended batch read whole") {
    val path = java.nio.file.Files.createTempDirectory("icwsidx").toString + "/idx"
    IcwsDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text", path, 0L)
    IcwsDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", path, 1L)
    val unpruned = pairSet(IcwsDelta.incrementalCandidates(delta, "doc_id", "text",
      IcwsDelta.readIndex(spark, path)))
    IcwsDelta.compactIndex(spark, path, numFiles = 4)
    val pruned = pairSet(IcwsDelta.incrementalCandidatesPruned(
      spark, path, delta, "doc_id", "text"))
    assert(pruned == unpruned, "file pruning must never change the candidate set")
    // the shared MinhashDelta maintenance surface sees ONE folded batch
    assert(spark.read.parquet(path).select("batch").distinct().count() == 1)
    // a post-compaction append is outside the manifest → read whole
    val extraDocs = delta.limit(0) // empty append exercises the path union
    IcwsDelta.writeBatch(extraDocs, "doc_id", "text", path, 7L)
    val prunedAfter = pairSet(IcwsDelta.incrementalCandidatesPruned(
      spark, path, delta, "doc_id", "text"))
    assert(prunedAfter == unpruned)
    // compactIfNeeded is shared verbatim: 1 user batch <= max -> no-op
    assert(!MinhashDelta.compactIfNeeded(spark, path, maxBatches = 16))
  }

  test("in-loop compaction: probe parity, replay across the crash window, bounded dirs") {
    val dirRoot = java.nio.file.Files.createTempDirectory("icwsloop").toString
    val (indexPath, pairsPath) = (s"$dirRoot/idx", s"$dirRoot/pairs")
    IcwsDelta.seedBatch(corpus, "doc_id", "text", indexPath)
    // compactEvery=1 makes the hook fire after EVERY append, so each
    // micro-batch exercises fold-the-previously-preserved-batch
    val sink = graft.streaming.StreamWeightedDedup
      .probeThenAppendParquet(indexPath, pairsPath, compactEvery = 1) _
    val parts = (0 until 4).map(i => delta.filter(col("doc_id") % 16 === i * 4))
    parts.zipWithIndex.foreach { case (p, i) => sink(p, i.toLong) }
    def streamed() = spark.read.parquet(pairsPath)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = pairSet(IcwsDelta.incrementalCandidates(
      delta, "doc_id", "text", IcwsDelta.bandRows(corpus, "doc_id", "text")))
    assert(streamed() == expected,
      "compaction between micro-batches must not change the candidate stream")
    // the CRASH WINDOW the preserve contract exists for: batch 3's
    // append AND the compaction both ran, the streaming commit never
    // landed, the batch replays. Preserved unfolded, the replay just
    // overwrites its own dir — pairs converge, no index row duplicates.
    sink(parts(3), 3L)
    assert(streamed() == expected, "replay across a compaction must converge")
    val idx = IcwsDelta.readIndex(spark, indexPath).localCheckpoint()
    assert(idx.count() == idx.distinct().count(),
      "a replayed batch must not duplicate index rows")
    // probe-listing cost stays flat: the compacted slot + the one
    // preserved in-flight batch, however many batches have streamed
    val dirs = new java.io.File(indexPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs.size <= 2, s"dir count must stay bounded, got $dirs")
    assert(dirs.contains("batch=-1"), s"compaction must have folded: $dirs")
  }
}
