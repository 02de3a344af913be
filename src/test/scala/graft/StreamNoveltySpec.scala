package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamNovelty

/** H27 `StreamNovelty` — the streaming twin of the oracled F37
  * `text_novelty` row. Pins: under doc_id-ordered arrival from an
  * empty index, the streamed per-doc reports equal the batch row
  * EXACTLY (the H23/F14b parity discipline); replay across a
  * compaction reproduces report and index byte-for-byte (the
  * own-batch exclusion absorb); the index stays a gram SET with
  * bounded dirs. */
class StreamNoveltySpec extends SparkTestBase {
  import spark.implicits._

  test("ordered streaming from empty reproduces the oracled batch row exactly") {
    val base = java.nio.file.Files.createTempDirectory("novloop").toString
    val (idxPath, repPath) = (s"$base/idx", s"$base/rep")
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select("doc_id", "text").localCheckpoint()
    StreamNovelty.seedGrams(
      spark.emptyDataset[String].toDF("gram"), idxPath)
    val sink = StreamNovelty.scoreThenAppendParquet(
      idxPath, repPath, compactEvery = 1) _
    // doc_id-ORDERED batches: arrival order == id order, the premise
    // under which streamed first-seen equals F37's global min doc_id
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val cuts = Seq(ids(ids.length / 3), ids(2 * ids.length / 3))
    val parts = Seq(
      docs.filter(col("doc_id") <= cuts(0)),
      docs.filter(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
      docs.filter(col("doc_id") > cuts(1)))
    parts.zipWithIndex.foreach { case (p, i) => sink(p, i.toLong) }

    def streamed() = spark.read.parquet(repPath)
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSet
    val batchRow = SparkEntry.queries("text_novelty")(spark, Sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    val s0 = streamed()
    assert(s0 == batchRow,
      s"missing=${(batchRow -- s0).take(3)} extra=${(s0 -- batchRow).take(3)}")

    // replay the in-flight batch across the compaction boundary: the
    // probe excludes its own dir, so it sees exactly what the first
    // delivery saw — report and index must not move
    val idxBefore = StreamNovelty.readIndex(spark, idxPath)
      .as[String].collect().sorted.toSeq
    sink(parts(2), 2L)
    assert(streamed() == batchRow, "replay must converge to the same reports")
    val idxAfter = StreamNovelty.readIndex(spark, idxPath)
      .as[String].collect().sorted.toSeq
    assert(idxAfter == idxBefore,
      "a replayed batch must not add, drop, or duplicate grams")
    // the index is a SET holding exactly the corpus's distinct grams
    assert(idxAfter.distinct == idxAfter)
    val corpusGrams = QueriesLLM.wordGramRows(docs)
      .select(explode(col("grams")).as("gram")).distinct().count()
    assert(idxAfter.size.toLong == corpusGrams)
    val dirs = new java.io.File(idxPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(dirs.size <= 2 && dirs.contains("batch=-1"),
      s"dir count must stay bounded under compactEvery=1, got $dirs")
  }
}
