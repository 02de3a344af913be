package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashFunctions

/** Incremental near-dup detection against a PERSISTED MinHash/LSH band
  * index — the 100-TB form of dedup_minhash (QueriesML): when a daily
  * delta lands, re-shingling and re-hashing the whole corpus is a full
  * 100-TB text scan; probing a stored band index is a scan of the
  * (thousands-of-times smaller) index plus MinHash over the delta
  * alone. Mirrors the reference's incremental-MERGE discipline
  * (etl-dag.sql: watermark-filtered increments, never full rebuilds)
  * applied to the dedup family.
  *
  * Index layout: `batch=N/` parquet partitions of
  * `(doc_id, lsh_key struct<band_id,band_hash>, sig array<long>)` —
  * one row per document per band. A replayed batch OVERWRITES its own
  * partition (the [[graft.streaming.MergeSink.sketchTopKParquet]]
  * layout-idempotence pattern), so at-least-once ingestion never
  * duplicates index rows.
  *
  * Constants are dedup_minhash's (5-gram shingles, k=32, 4 bands × 8
  * rows, 0.4 signature-estimate threshold); MinhashDeltaSpec pins that
  * the incremental result equals the full self-join recompute
  * restricted to pairs touching the delta — exact, because seeded
  * xxhash64 signatures are deterministic.
  */
object MinhashDelta {

  val ShingleN = 5
  val K = 32
  val Bands = 4
  val RowsPerBand = 8
  val Threshold = 0.4

  /** One row per (document, band): the index unit. MinHash runs in
    * WholeStageCodegen (k MIN aggregates over exploded shingle
    * positions); the output shuffle is |docs|-sized. */
  def bandRows(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    HashFunctions.minhashSignaturesText(docs, idCol, textCol, ShingleN, K)
      .withColumn("bands", HashFunctions.lshBands(col("sig"), Bands, RowsPerBand))
      .select(col(idCol).as("doc_id"), explode(col("bands")).as("lsh_key"),
        col("sig"))

  /** Lands one ingestion batch in the index. Same batch id → same
    * directory → overwrite: replay-idempotent by layout. */
  def writeBatch(
      docs: DataFrame, idCol: String, textCol: String,
      path: String, batchId: Long): Unit =
    bandRows(docs, idCol, textCol)
      .write.mode("overwrite").parquet(s"$path/batch=$batchId")

  /** The full index (all batches). `batch` is a partition column —
    * dropped, probes are batch-agnostic. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("batch")

  /** Signature-estimate Jaccard — [[HashFunctions.signatureEstimate]],
    * the SAME expression dedup_minhash filters on. Symmetric, so
    * old-new pairs need no signature swap. */
  private def estimate(a: Column, b: Column): Column =
    HashFunctions.signatureEstimate(a, b, K)

  /** Bucket-local self-join of one band-row frame → scored (a<b)
    * pairs: the within-delta and batch-mode kernel. */
  private def selfPairs(d: DataFrame): DataFrame =
    d.as("a")
      .join(d.as("b"), expr("a.lsh_key = b.lsh_key AND a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        estimate(col("a.sig"), col("b.sig")).as("jaccard_est"))

  /** Near-dup pairs involving the delta: delta×corpus (via the index)
    * plus delta×delta. The corpus index is STREAMED — the delta's band
    * rows broadcast, so the index is read once, shuffled never, and
    * corpus text is never touched. Pairs are (id_a < id_b), matching
    * dedup_minhash's convention; `distinct` collapses multi-band
    * collisions. Contract: delta ids are disjoint from indexed ids
    * (re-ingested ids would pair with themselves; the self-pair guard
    * drops the degenerate case but a changed text under a reused id
    * belongs in the index via its batch overwrite, not the delta). */
  def incrementalPairs(
      delta: DataFrame, idCol: String, textCol: String,
      index: DataFrame, broadcastDelta: Boolean = true): DataFrame = {
    // build the delta's band rows ONCE (the self-join below would
    // otherwise instantiate the k-min aggregation per side)
    val d = bandRows(delta, idCol, textCol).localCheckpoint()
    // daily-increment contract: delta ≪ corpus, so broadcast it and
    // stream the index. A BULK backfill (delta too big to broadcast)
    // passes broadcastDelta=false and the probe becomes an ordinary
    // shuffled equi-join on lsh_key — the same micro-batch/bulk split
    // as IncrementalMerge's upsert (B7b)
    val probeSide = if (broadcastDelta) broadcast(d) else d
    val oldNew = index.as("i")
      .join(probeSide.as("d"),
        expr("i.lsh_key = d.lsh_key AND i.doc_id <> d.doc_id"))
      .select(
        least(col("i.doc_id"), col("d.doc_id")).as("id_a"),
        greatest(col("i.doc_id"), col("d.doc_id")).as("id_b"),
        estimate(col("i.sig"), col("d.sig")).as("jaccard_est"))
    oldNew.unionAll(selfPairs(d))
      .filter(col("jaccard_est") >= Threshold)
      .distinct()
  }

  /** Full self-join recompute over one frame — the parity yardstick
    * (and the batch-mode path when there IS no index yet). */
  def allPairs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    selfPairs(bandRows(docs, idCol, textCol).localCheckpoint())
      .filter(col("jaccard_est") >= Threshold)
      .distinct()
}
