package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ONE compaction kernel behind every `batch=N`-laid persisted
  * probe index (MinhashDelta/IcwsDelta band rows, Winnow
  * fingerprints, StreamCorpusPrep gram rows). Review finding (r11):
  * the fold/preserve/publish protocol lived three times and a
  * protocol bug had to be found — and fixed — three times.
  *
  * Protocol: clear any stale staging leftovers (a compaction that
  * crashed between staging and publish must not leak its half-staged
  * dirs into the NEXT successful publish — stale `batch=N` copies
  * beside the fold would duplicate every preserved row, and a
  * `FileUtil.copy` into an existing destination NESTS, breaking
  * partition discovery), fold everything but `preserveBatchIds` into
  * the RESERVED `batch=-1` slot clustered by `clusterCols`, run the
  * caller's `postFold` (e.g. MinhashDelta's range manifest), COPY the
  * preserved dirs in verbatim (copy, not move — the live index stays
  * intact until the swap), then publish by
  * [[graft.sources.LakeWriter.publish]]'s atomic rename.
  *
  * `preserveBatchIds` carries the in-flight micro-batch: committed
  * batches never replay (Structured Streaming commits in order), but
  * the in-flight one can, and a replay of a FOLDED batch would
  * recreate its `batch=N` dir beside the compacted rows, duplicating
  * its index rows — MinHash probes absorb that (`distinct`
  * collapses candidates) but Winnow's n_shared COUNTS rows, so the
  * loop-safe contract is uniform: never fold a batch that can still
  * replay. */
private[graft] object BatchIndex {

  def compact(spark: SparkSession, path: String, numFiles: Int,
      clusterCols: Seq[String], preserveBatchIds: Set[Long],
      postFold: String => Unit = _ => ()): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val staged = graft.sources.LakeWriter.stagingPath(path)
    // stale-staging clear: mode("overwrite") below cleans only the
    // dirs this run writes; a crashed prior compaction's other
    // batch=N copies would ride the publish otherwise
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    val flat =
      if (preserveBatchIds.isEmpty)
        spark.read.parquet(path).drop("batch")
      else spark.read.parquet(path)
        .filter(!col("batch").isin(preserveBatchIds.toSeq: _*))
        .drop("batch")
    flat.repartitionByRange(numFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write.mode("overwrite").parquet(s"$staged/batch=-1")
    postFold(staged)
    // carry preserved dirs into the staged copy — COPY, not move: the
    // live index must stay intact until the publish swap
    preserveBatchIds.foreach { id =>
      val src = new org.apache.hadoop.fs.Path(s"$path/batch=$id")
      if (fs.exists(src))
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs,
          new org.apache.hadoop.fs.Path(s"$staged/batch=$id"), false, conf)
    }
    graft.sources.LakeWriter.publish(spark, staged, path)
  }

  /** Runs [[compact]] when the non-reserved batch-dir count crosses
    * `maxBatches` (the `batch=-1` slot does not count — it IS the
    * compaction product). Returns whether a compaction ran. */
  def compactIfNeeded(spark: SparkSession, path: String,
      maxBatches: Int, numFiles: Int, clusterCols: Seq[String],
      preserveBatchIds: Set[Long],
      postFold: String => Unit = _ => ()): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return false
    val batches = fs.listStatus(root).count(s => s.isDirectory && {
      val n = s.getPath.getName
      n.startsWith("batch=") && n != "batch=-1"
    })
    val due = batches > maxBatches
    if (due) compact(spark, path, numFiles, clusterCols, preserveBatchIds,
      postFold)
    due
  }
}
