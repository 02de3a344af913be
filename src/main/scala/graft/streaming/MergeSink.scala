package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.operators.IncrementalMerge

/** Streaming form of the reference's incremental MERGE (etl-dag.sql):
  * each micro-batch is insert-only-merged into a parquet target via
  * foreachBatch — the canonical Spark pattern for an idempotent,
  * exactly-once-per-key sink when the store has no native MERGE.
  *
  * Re-delivered rows (at-least-once sources, restarted queries) are
  * dropped by the anti-join on the merge key, so the sink is
  * idempotent. At lake scale the target would be a Delta/Iceberg table
  * whose MERGE INTO takes this role; the batch function is the only
  * thing that changes.
  */
object MergeSink {

  /** Returns a (batchDF, batchId) function for
    * `writeStream.foreachBatch`. Dedups the batch on `keys` (a source
    * may redeliver within one micro-batch), anti-joins against the
    * existing target, appends. Only a genuinely absent target counts
    * as "first batch" — any other read error propagates, because
    * swallowing it would append duplicates and silently break the
    * per-key contract. */
  def insertOnlyParquet(targetPath: String, keys: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val deduped = batch.dropDuplicates(keys)
    val path = new org.apache.hadoop.fs.Path(targetPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fresh =
      if (!fs.exists(path)) deduped
      else {
        val target = spark.read.parquet(targetPath)
        deduped.join(target.select(keys.map(target.col): _*).distinct(), keys, "left_anti")
      }
    fresh.write.mode(SaveMode.Append).parquet(targetPath)
  }

  /** Upsert sink: each micro-batch REPLACES matching keys (highest
    * `versionCols` wins within the batch) and inserts the rest. A
    * plain parquet target cannot delete in place, so the merged result
    * is rewritten in full — STAGED next to the live target and
    * published by rename ([[graft.sources.LakeWriter.publish]]): the
    * merge job reads the intact target while writing, so a crash or
    * executor loss mid-rewrite never strands a half-written target
    * (the in-place overwrite + localCheckpoint it replaces lost the
    * whole table if lineage blocks died after the delete started). On
    * a lake this batch function becomes Delta/Iceberg `MERGE INTO` and
    * the rewrite disappears. Restated late data converges because
    * replays re-assert the same (key, version) winners. */
  def upsertParquet(targetPath: String, keys: Seq[String], versionCols: Seq[String])(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(targetPath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) {
      IncrementalMerge.latestPerKey(batch, keys, versionCols)
        .write.mode(SaveMode.Append).parquet(targetPath)
    } else {
      val target = spark.read.parquet(targetPath)
      val merged = IncrementalMerge.upsert(target, batch, keys, versionCols)
      val staged = graft.sources.LakeWriter.stagingPath(targetPath)
      merged.write.mode(SaveMode.Overwrite).parquet(staged)
      graft.sources.LakeWriter.publish(spark, staged, targetPath)
    }
  }

  /** Batch-side equivalence helper (spec + docs): the result any
    * sequence of insertOnlyParquet batches must converge to. Each batch
    * is deduped on the keys first — exactly what the sink does — so a
    * first batch with intra-batch duplicate keys converges identically. */
  def expectedTarget(allBatches: Seq[DataFrame], keys: Seq[String]): DataFrame =
    allBatches.map(_.dropDuplicates(keys))
      .reduce((t, b) => IncrementalMerge.insertOnly(t, b, keys))
}
