package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE protocol surface for every `batch=N`-laid persisted probe
  * index — the facade over [[BatchIndex]]'s compaction kernel that
  * the five index families (MinHash/ICWS band rows, Winnow
  * fingerprints, corpus-prep gram rows, contamination state) extend
  * instead of re-declaring. Round-11's review found the SAME protocol
  * bug class three times across hand-copied surfaces (stale staging,
  * fold-the-in-flight-batch, seed-space overwrite); a family that
  * inherits this trait structurally cannot re-introduce them.
  *
  * Protocol invariants the trait owns:
  *
  *   - **Batch landing is overwrite-by-dir**: `batch=<id>` is the
  *     replay unit — an at-least-once re-delivery overwrites its own
  *     partition instead of appending a second copy (index rows never
  *     duplicate under replay).
  *   - **Negative ids are reserved**: `batch=-1` is the compaction
  *     product; a user batch there would let its own replay destroy
  *     the folded index ([[landBatch]] rejects).
  *   - **The id space is split structurally**: stream micro-batch ids
  *     own `[0, SeedBatchId)` (they are monotone across restarts —
  *     they persist in the stream checkpoint), seeds own
  *     `[SeedBatchId, ∞)`. Micro-batch 0 can therefore never
  *     silently overwrite a seeded standing corpus — a mis-seeded
  *     index fails LOUDLY at write time. The split point is
  *     Long.MaxValue/2, not a human-scale round number: a low cap
  *     would give a 1-second-trigger pipeline a built-in crash after
  *     days (no stream reaches 2⁶² batches).
  *   - **Compaction preserves the in-flight batch**: committed
  *     batches never replay (Structured Streaming commits in order)
  *     but the in-flight one can, and a replayed FOLDED batch would
  *     recreate its dir beside the compacted rows, duplicating every
  *     one of its index rows — fatal where rows are COUNTED (Winnow's
  *     n_shared). Callers pass the in-flight id via
  *     `preserveBatchIds`; [[BatchIndex.compact]] carries those dirs
  *     verbatim and clears stale staging leftovers first.
  *
  * Families parameterize two things: [[clusterCols]] — the sort/range
  * keys of the folded `batch=-1` slot — and optionally [[postFold]],
  * the hook that writes family-specific sidecars over the staged fold
  * (the band-hash families' per-file range manifest feeding
  * [[MinhashDelta.prunedIndexFrame]]'s probe-time file pruning; the
  * equi-join families need none — their compaction buys bounded
  * file/dir counts, not range pruning).
  */
trait CompactableIndex {

  /** Cluster columns of the folded `batch=-1` slot — the keys probes
    * join/range on, so the fold's range lay keeps per-file min/max
    * statistics tight. */
  protected def clusterCols: Seq[String]

  /** Post-fold hook over the staged compaction dir (e.g. a per-file
    * range manifest). Runs BEFORE preserved dirs are copied in and
    * before the atomic publish. Default: none. */
  protected def postFold(spark: SparkSession): String => Unit = _ => ()

  /** Stream batch ids live strictly BELOW this; seeds at or above. */
  final val SeedBatchId: Long = Long.MaxValue / 2

  /** Lands index rows under a batch dir — the replay-unit write every
    * family's batch-mode path uses. Rejects the reserved negative
    * (compaction) space only; batch jobs manage their own id
    * discipline. `rows` is BY-NAME: the id guard fires before any
    * (possibly eagerly-checkpointing) row derivation runs. */
  protected final def landBatch(
      rows: => DataFrame, path: String, batchId: Long): Unit = {
    require(batchId >= 0L,
      s"negative batch ids are reserved for compaction, got $batchId")
    rows.write.mode("overwrite").parquet(s"$path/batch=$batchId")
  }

  /** [[landBatch]] constrained to the STREAM id space — the append
    * side of a foreachBatch loop; refuses the seed space so no
    * micro-batch id can ever collide with a seeded corpus. */
  protected final def landStreamBatch(
      rows: => DataFrame, path: String, batchId: Long): Unit = {
    require(batchId >= 0L && batchId < SeedBatchId,
      s"stream batch ids must be in [0, $SeedBatchId), got $batchId")
    rows.write.mode("overwrite").parquet(s"$path/batch=$batchId")
  }

  /** [[landBatch]] constrained to the SEED id space — the standing-
    * corpus bootstrap of a streaming loop. */
  protected final def landSeedBatch(
      rows: => DataFrame, path: String, seedId: Long): Unit = {
    require(seedId >= SeedBatchId,
      s"seed ids must be >= $SeedBatchId (stream micro-batch ids own " +
        s"0..${SeedBatchId - 1}), got $seedId")
    rows.write.mode("overwrite").parquet(s"$path/batch=$seedId")
  }

  /** The full index (all batches). `batch` is a partition column —
    * dropped, probes are batch-agnostic. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")

  /** Folds every `batch=N` dir into the reserved range-laid
    * `batch=-1` slot via [[BatchIndex.compact]] (staged + atomically
    * published; `preserveBatchIds` carried verbatim — pass the
    * in-flight batch id from a streaming loop). */
  def compactIndex(spark: SparkSession, path: String,
      numFiles: Int = 32, preserveBatchIds: Set[Long] = Set.empty): Unit =
    BatchIndex.compact(spark, path, numFiles, clusterCols,
      preserveBatchIds, postFold(spark))

  /** Compacts when the non-reserved batch-dir count crosses
    * `maxBatches` (`batch=-1` does not count — it IS the compaction
    * product); the streaming loops' in-loop maintenance hook. Returns
    * whether a compaction ran. */
  def compactIfNeeded(spark: SparkSession, path: String,
      maxBatches: Int = 16, numFiles: Int = 32,
      preserveBatchIds: Set[Long] = Set.empty): Boolean =
    BatchIndex.compactIfNeeded(spark, path, maxBatches, numFiles,
      clusterCols, preserveBatchIds, postFold(spark))
}
