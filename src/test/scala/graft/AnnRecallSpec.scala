package graft

/** E12 `ann_recall_report` — the sampled-queries index-quality eval.
  * The DuckDB oracle pins the full arithmetic (md5 hyperplane
  * buckets, both top-10s, hits, recall); this spec pins the eval's
  * INVARIANTS, which survive any corpus regeneration. */
class AnnRecallSpec extends SparkTestBase {

  test("recall report: one row per sampled query, bounded recall, pruning-only misses") {
    val rows = SparkEntry.queries("ann_recall_report")(spark, Sf).collect()
    assert(rows.length == 8, s"one row per sampled query, got ${rows.length}")
    val corpus = graft.sources.ViewingData.table(spark, Sf, "embeddings").count()
    rows.foreach { r =>
      val (nCand, hits, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= 10, s"hits out of range: $r")
      assert(math.abs(recall - hits / 10.0) < 1e-9, s"recall != hits/10: $r")
      assert(nCand >= 0 && nCand <= corpus - 1, s"candidates exceed corpus: $r")
      // a miss can ONLY come from pruning: a bucket holding every
      // other vector makes approx == exact and recall 1.0
      if (recall < 1.0)
        assert(nCand < corpus - 1,
          s"recall < 1 with an unpruned candidate set: $r")
    }
    // the sample must exercise the trade at this corpus: at least one
    // query prunes (ANN is doing something) — all-8-at-recall-0 would
    // mean a broken bucket join rather than an eval
    assert(rows.exists(_.getLong(1) < corpus - 1), "no query pruned")
    assert(rows.map(_.getLong(2)).sum > 0, "zero hits across all queries")
  }
}
