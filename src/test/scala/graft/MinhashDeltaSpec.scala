package graft

import org.apache.spark.sql.functions._

import graft.operators.MinhashDelta
import graft.sources.ViewingData

/** Pins the three properties that make [[MinhashDelta]] the 100-TB
  * dedup increment: (1) EXACTNESS — probing the index finds exactly
  * the full recompute's pairs restricted to delta-touching ones
  * (deterministic seeded signatures make this equality, not
  * approximation); (2) the persisted batch=N layout is
  * replay-idempotent (a re-landed batch overwrites itself); (3) the
  * probe never re-reads corpus text and never shuffles the index
  * (delta band rows broadcast). */
class MinhashDeltaSpec extends SparkTestBase {

  private def docs = ViewingData.table(spark, Sf, "documents")
    .select(col("doc_id"), col("text"))

  private def corpus = docs.filter(col("doc_id") % 4 =!= 0)
  private def delta = docs.filter(col("doc_id") % 4 === 0)

  test("incremental == full recompute restricted to delta-touching pairs") {
    val full = MinhashDelta.allPairs(docs, "doc_id", "text")
    val deltaIds = delta.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expected = full.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter { case (a, b, _) => deltaIds(a) || deltaIds(b) }.toSet
    val got = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.bandRows(corpus, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty, "the shape must actually find near-dups")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    // the bulk-backfill path (no broadcast hint) is pair-identical
    val bulk = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.bandRows(corpus, "doc_id", "text"), broadcastDelta = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bulk == expected, "hint-free bulk path must match")
  }

  test("persisted index: batch layout round-trips; a replayed batch is a no-op") {
    val path = java.nio.file.Files.createTempDirectory("mhidx").toString + "/idx"
    MinhashDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 1), "doc_id", "text", path, 0L)
    MinhashDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", path, 1L)
    val viaDisk = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaMemory = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.bandRows(corpus, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaDisk == viaMemory, "disk index must probe identically")
    // replay batch 1 (at-least-once delivery): same rows, not doubled
    val before = MinhashDelta.readIndex(spark, path).count()
    MinhashDelta.writeBatch(corpus.filter(col("doc_id") % 2 === 0), "doc_id", "text", path, 1L)
    assert(MinhashDelta.readIndex(spark, path).count() == before,
      "a replayed batch must overwrite its own partition, not append")
  }

  test("streaming increment: probe-then-append in foreachBatch, replay converges") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("mhstream").toString
    val idxPath = s"$base/idx"
    val pairsPath = s"$base/pairs"
    // corpus index exists before the stream starts (a high user-space
    // batch id, clear of the stream's 0..N and of the reserved
    // negative compaction slot)
    MinhashDelta.writeBatch(corpus, "doc_id", "text", idxPath, 1000000L)
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val deltaIds = delta.collect().map(_.getLong(0)).sorted
    val (half1, half2) = deltaIds.splitAt(deltaIds.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = input.toDF().toDF("doc_id").writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val withText = batch.as[Long].collect().toSeq
          .map(i => (i, texts(i))).toDF("doc_id", "text")
        // probe against everything indexed SO FAR, then append this
        // batch — each near-dup pair is found exactly once, when its
        // later member arrives
        // overwrite-by-batch-dir, same as the index side: a replayed
        // foreachBatch overwrites its own pairs partition instead of
        // appending a second copy
        MinhashDelta.incrementalPairs(withText, "doc_id", "text",
            MinhashDelta.readIndex(spark, idxPath))
          .write.mode("overwrite").parquet(s"$pairsPath/batch=$id")
        MinhashDelta.writeBatch(withText, "doc_id", "text", idxPath, id)
      }
      .start()
    try {
      input.addData(half1: _*); q.processAllAvailable()
      input.addData(half2: _*); q.processAllAvailable()
      val streamed = spark.read.parquet(pairsPath)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val oneShot = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
          MinhashDelta.bandRows(corpus, "doc_id", "text"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == oneShot,
        s"two micro-batches must find the one-shot delta's pairs: " +
          s"missing=${(oneShot -- streamed).take(5)} extra=${(streamed -- oneShot).take(5)}")
      // replayed index append (at-least-once): the index is unchanged,
      // so a re-probe of half2 returns the same pairs it already found
      val before = MinhashDelta.readIndex(spark, idxPath).count()
      MinhashDelta.writeBatch(half2.toSeq.map(i => (i, texts(i))).toDF("doc_id", "text"),
        "doc_id", "text", idxPath, 1L)
      assert(MinhashDelta.readIndex(spark, idxPath).count() == before)
    } finally q.stop()
  }

  test("compaction: one range-laid batch, probe parity, file skipping, replay-safe") {
    val path = java.nio.file.Files.createTempDirectory("mhcompact").toString + "/idx"
    val half1 = corpus.filter(col("doc_id") % 2 === 1)
    val half2 = corpus.filter(col("doc_id") % 2 === 0)
    MinhashDelta.writeBatch(half1, "doc_id", "text", path, 0L)
    MinhashDelta.writeBatch(half2, "doc_id", "text", path, 1L)
    val before = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    MinhashDelta.compactIndex(spark, path, numFiles = 8)
    // one batch dir, same rows
    val dirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
    assert(dirs.toSeq == Seq("batch=-1"),
      s"compaction must land in the RESERVED slot: ${dirs.toSeq}")
    // full probe parity after the swap
    val after = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before, "compaction must not change probe results")
    // pruned probe: same pairs, fewer files touched for a tiny delta
    val tiny = delta.limit(3).localCheckpoint()
    val hashes = MinhashDelta.bandRows(tiny, "doc_id", "text")
      .select(col("lsh_key.band_hash")).distinct()
      .collect().map(_.getLong(0)).sorted
    val (kept, total) = MinhashDelta.pruneIndexFiles(spark, path, hashes)
    assert(total >= 8 && kept.size < total,
      s"a 3-doc delta must skip SOME of the $total range-laid files (kept ${kept.size})")
    val prunedPairs = MinhashDelta.incrementalPairsPruned(
        spark, path, tiny, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPairs = MinhashDelta.incrementalPairs(tiny, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prunedPairs == fullPairs, "file skipping must be invisible to results")
    // a pre-compaction batch replayed AFTER the swap — INCLUDING batch
    // 0, the id that would overwrite a compacted slot named batch=0
    // and destroy every other folded batch. The reserved batch=-1
    // slot makes both replays land beside the compacted data:
    // duplicate index rows, unchanged pair set (distinct collapses
    // duplicate candidates), pruned probe still served by the manifest
    MinhashDelta.writeBatch(half2, "doc_id", "text", path, 1L)
    MinhashDelta.writeBatch(half1, "doc_id", "text", path, 0L)
    val replayed = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayed == before, "replay after compaction must not change pairs")
    val prunedReplayed = MinhashDelta.incrementalPairsPruned(
        spark, path, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prunedReplayed == before,
      "pruned probe must survive a batch-0 replay of the compacted index")
    intercept[IllegalArgumentException] {
      MinhashDelta.writeBatch(half1, "doc_id", "text", path, -1L)
    }
    // a batch APPENDED after compaction is outside the manifest — the
    // pruned probe must still see it (read whole beside pruned files):
    // land NEW docs whose text copies the delta's (identical
    // signatures → guaranteed matches), then probe the delta. If the
    // appended batch were invisible to the pruned path these exact-dup
    // pairs would vanish.
    val appended = delta.select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    MinhashDelta.writeBatch(appended, "doc_id", "text", path, 2L)
    val prunedAfterAppend = MinhashDelta.incrementalPairsPruned(
        spark, path, delta, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullAfterAppend = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(prunedAfterAppend.exists(_._2 >= 1000000L),
      "the appended twins must appear in the pruned probe's pairs")
    assert(prunedAfterAppend == fullAfterAppend,
      "pruned probe must read post-compaction batches in full")
  }

  test("compactIfNeeded: fires past the batch threshold, idle below it") {
    val path = java.nio.file.Files.createTempDirectory("mhauto").toString + "/idx"
    val half = corpus.filter(col("doc_id") % 2 === 1)
    (0 to 2).foreach(i =>
      MinhashDelta.writeBatch(half, "doc_id", "text", path, i.toLong))
    assert(!MinhashDelta.compactIfNeeded(spark, path, maxBatches = 3),
      "3 batches is within a threshold of 3")
    MinhashDelta.writeBatch(half, "doc_id", "text", path, 3L)
    assert(MinhashDelta.compactIfNeeded(spark, path, maxBatches = 3),
      "4 batches must trigger")
    val dirs = new java.io.File(path).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("batch=")).map(_.getName)
    assert(dirs.toSeq == Seq("batch=-1"), dirs.toSeq.toString)
    // the compacted slot does not re-trigger
    assert(!MinhashDelta.compactIfNeeded(spark, path, maxBatches = 0),
      "the batch=-1 product must not count toward the threshold")
  }

  test("compaction clears stale staging leftovers from a crashed prior run") {
    // r11 review: the staging dir is a FIXED sibling path, so a
    // compaction that crashed between staging and publish leaves its
    // dirs behind; the next successful compaction must not publish
    // them (a stale batch=N copy beside the fold would duplicate its
    // rows — and a FileUtil.copy into an existing preserved dir
    // NESTS, breaking partition discovery).
    val path = java.nio.file.Files.createTempDirectory("mhstale").toString + "/idx"
    MinhashDelta.writeBatch(corpus, "doc_id", "text", path, 0L)
    def probePairs() = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
        MinhashDelta.readIndex(spark, path))
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val before = probePairs()
    // simulate the crash leftover: a rogue batch dir in the staging path
    val staged = graft.sources.LakeWriter.stagingPath(path)
    MinhashDelta.bandRows(delta, "doc_id", "text")
      .write.parquet(s"$staged/batch=7")
    MinhashDelta.compactIndex(spark, path, numFiles = 4,
      preserveBatchIds = Set(0L))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs == Set("batch=-1", "batch=0"),
      s"stale staged batch must not ride the publish: $dirs")
    // the preserved dir must be a clean copy, not a nested one
    assert(!new java.io.File(s"$path/batch=0/batch=0").exists(),
      "preserve copy must never nest into a stale destination")
    assert(probePairs() == before,
      "stale leftovers must not change probe results")
  }

  test("ensureArtifact: staged dir cleaned on build failure; a winner is never deleted") {
    val base = java.nio.file.Files.createTempDirectory("artifact").toString
    val path = s"$base/art"
    def stageDirs() = new java.io.File(base).listFiles()
      .map(_.getName).count(_.contains("__stage_"))
    // build failure: the staged dir must not leak
    intercept[RuntimeException] {
      QueriesML.ensureArtifact(spark, path, "_SUCCESS") { st =>
        spark.range(1).write.parquet(st)
        throw new RuntimeException("build died")
      }
    }
    assert(stageDirs() == 0, "failed build must clean its staging dir")
    assert(!new java.io.File(path).exists())
    // a concurrent winner publishing mid-build: the loser must keep
    // the winner's artifact and drop its own staged copy
    QueriesML.ensureArtifact(spark, path, "_SUCCESS") { st =>
      spark.range(5).toDF("winner").write.parquet(path) // the winner lands
      spark.range(9).toDF("loser").write.parquet(st)
    }
    assert(spark.read.parquet(path).columns.toSeq == Seq("winner"),
      "the concurrent winner's complete artifact must survive")
    assert(stageDirs() == 0, "the loser's staged copy must be dropped")
    // idempotent fast path: marker present -> build not invoked
    QueriesML.ensureArtifact(spark, path, "_SUCCESS") { _ =>
      fail("build must not run when the marker exists")
    }
    // torn leftover (a crashed pre-staging in-place build left a
    // marker-less target): it must be moved aside and REPLACED, and
    // the aside dir must not linger
    val path2 = s"$base/art2"
    new java.io.File(path2).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path2/partial.bin"), Array[Byte](1, 2, 3))
    QueriesML.ensureArtifact(spark, path2, "_SUCCESS") { st =>
      spark.range(3).toDF("fresh").write.parquet(st)
    }
    assert(spark.read.parquet(path2).columns.toSeq == Seq("fresh"),
      "a torn marker-less target must be replaced by the fresh build")
    assert(!new java.io.File(s"$path2/partial.bin").exists())
    assert(new java.io.File(base).listFiles()
      .count(f => f.getName.contains("__torn_") || f.getName.contains("__stage_")) == 0,
      "no aside/staging leftovers after a torn-target publish")
  }

  test("probe plan: corpus text never re-read, index never shuffled") {
    val path = java.nio.file.Files.createTempDirectory("mhidx2").toString + "/idx"
    MinhashDelta.writeBatch(corpus, "doc_id", "text", path, 0L)
    // the plan-shape pin tests the daily-increment HINT explicitly
    // (broadcastDelta defaults to false since r11 — the default path
    // lets AQE decide from the checkpoint's size stats, which the
    // static sparkPlan below cannot see)
    val probe = MinhashDelta.incrementalPairs(delta, "doc_id", "text",
      MinhashDelta.readIndex(spark, path), broadcastDelta = true)
    // sparkPlan, not executedPlan: AQE wraps the tree and hides leaves
    val plan = probe.queryExecution.sparkPlan
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    // the only documents.parquet scan is the delta's own band build
    // (inside the localCheckpoint, so absent from THIS plan); the
    // probe itself reads the index parquet alone
    assert(scans.nonEmpty && scans.forall(_.contains("idx")),
      s"probe must scan only the index: $scans")
    val p = plan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"delta band rows must broadcast so the index streams:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the index side must never shuffle:\n$p")
  }
}
