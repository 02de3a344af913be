package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamCorpusPrep
import graft.sources.ViewingData

/** F14b (`corpus_prep_incremental`) as a foreachBatch loop — the
  * streamed == batch contract of IcwsDeltaSpec's probe-then-append
  * tests, on the corpus-prep family: single-batch stream equals the
  * DuckDB-oracled registry row outright; a multi-batch split equals
  * ITERATING the registry row's decision kernel (the first-arrival
  * induction); re-delivery converges; the in-loop compaction hook
  * keeps the index dir count bounded without changing outputs. */
class StreamCorpusPrepSpec extends SparkTestBase {

  private def docs = ViewingData.table(spark, Sf, "documents")
    .select("doc_id", "lang", "n_chars", "text")
  private def standing = docs.filter(col("doc_id") % 4 =!= 0)
  private def delta = docs.filter(col("doc_id") % 4 === 0)

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "shard", "text_sig", "n_tokens", "cum_tokens", "pack_id")
      .collect().map(_.toString).toSet

  test("single-batch stream == the oracled corpus_prep_incremental row") {
    val base = java.nio.file.Files.createTempDirectory("cpstream1").toString
    val (idx, out) = (s"$base/idx", s"$base/out")
    StreamCorpusPrep.seedBatch(standing, idx)
    val sink = StreamCorpusPrep.probeThenAppendParquet(idx, out) _
    sink(delta, 0L)
    val streamed = rowSet(spark.read.parquet(s"$out/batch=0"))
    val batchRow = rowSet(SparkEntry.queries("corpus_prep_incremental")(spark, Sf))
    assert(streamed.nonEmpty && streamed == batchRow,
      s"missing=${(batchRow -- streamed).take(3)} extra=${(streamed -- batchRow).take(3)}")
    // the structural id-space split holds here too
    intercept[IllegalArgumentException] {
      StreamCorpusPrep.seedBatch(standing, idx, seedId = 0L)
    }
    intercept[IllegalArgumentException] {
      StreamCorpusPrep.writeBatch(
        StreamCorpusPrep.gramRows(delta), idx, StreamCorpusPrep.SeedBatchId)
    }
  }

  test("multi-batch split == iterated increments; replay converges; compaction bounded") {
    val base = java.nio.file.Files.createTempDirectory("cpstreamN").toString
    val (idx, out) = (s"$base/idx", s"$base/out")
    StreamCorpusPrep.seedBatch(standing, idx)
    // compactEvery=1 fires the hook after every append — each batch
    // exercises fold-the-previously-preserved-batch
    val sink = StreamCorpusPrep.probeThenAppendParquet(idx, out, compactEvery = 1) _
    val parts = (0 until 3).map(i => delta.filter(col("doc_id") % 12 === i * 4))
    parts.zipWithIndex.foreach { case (p, i) => sink(p, i.toLong) }
    // yardstick: ITERATE the registry row's decision kernel batch by
    // batch with an explicit standing frame — the first-arrival
    // induction this loop implements (an all-at-once F14b run is the
    // single-batch test above; across batches first-arrival is the
    // contract, so the yardstick must arrive in the same order)
    var standGrams = StreamCorpusPrep.gramRows(standing).localCheckpoint()
    val expected = parts.map { p =>
      val g = StreamCorpusPrep.gramRows(p).localCheckpoint()
      val dupes = StreamCorpusPrep.dupeIds(standGrams, g).localCheckpoint()
      val kept = p.join(dupes, Seq("doc_id"), "left_anti")
      standGrams = standGrams
        .unionByName(g.join(dupes, Seq("doc_id"), "left_anti"))
        .localCheckpoint()
      rowSet(QueriesLLM.prepKept(kept))
    }
    (0 until 3).foreach { i =>
      assert(rowSet(spark.read.parquet(s"$out/batch=$i")) == expected(i),
        s"batch $i must equal the iterated increment")
    }
    // replay the LAST batch across its compaction (the crash window:
    // append + compaction ran, commit didn't) — outputs converge
    sink(parts(2), 2L)
    (0 until 3).foreach { i =>
      assert(rowSet(spark.read.parquet(s"$out/batch=$i")) == expected(i),
        s"replay must converge for batch $i")
    }
    // index holds exactly standing + survivors, no duplicates
    val idxDf = StreamCorpusPrep.readIndex(spark, idx)
      .select("doc_id").localCheckpoint()
    assert(idxDf.count() == idxDf.distinct().count(),
      "a replayed batch must not duplicate index rows")
    // dir count bounded: compacted slot + the one preserved batch
    val dirs = new java.io.File(idx).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs.size <= 2 && dirs.contains("batch=-1"),
      s"dir count must stay bounded, got $dirs")
    // survivors-only indexing: every dropped dup is absent
    val keptIds = idxDf.collect().map(_.getLong(0)).toSet
    val deltaIds = delta.select("doc_id").collect().map(_.getLong(0)).toSet
    val preppedIds = spark.read.parquet(out)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // prepped ⊆ indexed survivors (gate may drop more than dedup did)
    assert(preppedIds.subsetOf(keptIds & deltaIds),
      "every prepped doc must be an indexed survivor")
  }
}
