package graft

/** F38 `dataset_card` — the per-(source, lang) release composition
  * table. The oracle pins the arithmetic; this spec pins the
  * bookkeeping: group rows partition the corpus (doc counts sum to
  * the table size), uniqueness bounds hold, and dup_rate is exactly
  * the uniqueness complement. */
class DatasetCardSpec extends SparkTestBase {

  test("card partitions the corpus; dup_rate is the uniqueness complement") {
    val rows = SparkEntry.queries("dataset_card")(spark, Sf).collect()
    assert(rows.nonEmpty)
    val total = spark.read.parquet(s"$Sf/documents.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    rows.foreach { r =>
      val (nDocs, nUniq) = (r.getLong(2), r.getLong(3))
      assert(nUniq >= 1 && nUniq <= nDocs)
      assert(r.getDouble(7) == BigDecimal(1.0 - nUniq.toDouble / nDocs)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) <= 1.0) // pct_short
      assert(r.getLong(4) > 0) // tokens: every doc has >= 1 ws token
    }
  }
}
