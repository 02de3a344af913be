package graft

import org.apache.spark.sql.functions._

/** F37 `text_novelty` — arrival-order novelty. The oracle pins the
  * arithmetic; this spec pins the conservation law that gives the
  * column its meaning: every distinct corpus gram is novel EXACTLY
  * once (at its min-doc_id first occurrence), so Σ n_novel over docs
  * equals the corpus's distinct-gram count — novelty mass is neither
  * created nor lost by the per-doc fold. Plus the boundary case: the
  * earliest emitting doc has novelty 1.0 by construction. */
class NoveltySpec extends SparkTestBase {

  test("novelty conserves distinct-gram mass; first doc is fully novel") {
    val out = SparkEntry.queries("text_novelty")(spark, Sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    out.foreach { case (id, nGrams, nNovel, novelty) =>
      assert(nNovel >= 0 && nNovel <= nGrams, s"doc $id: $nNovel of $nGrams")
      assert(novelty >= 0.0 && novelty <= 1.0)
    }
    // conservation: Σ n_novel == |distinct grams in the corpus|
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val distinctGrams = QueriesLLM.wordGramRows(docs)
      .select(explode(col("grams")).as("gram")).distinct().count()
    assert(out.map(_._3).sum == distinctGrams,
      s"sum(n_novel) ${out.map(_._3).sum} != corpus distinct grams $distinctGrams")
    // the earliest doc that emits grams saw nothing before it
    val first = out.minBy(_._1)
    assert(first._4 == 1.0, s"first doc ${first._1} novelty ${first._4} != 1.0")
  }
}
