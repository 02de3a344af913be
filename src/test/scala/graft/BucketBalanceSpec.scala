package graft

/** E13 `ann_bucket_balance` — the index-health occupancy report. The
  * oracle pins the arithmetic; this spec pins what the reader infers
  * from it: occupancies partition the corpus, the bucket space is
  * bounded by 2^planes, and the expected single-bucket probe cost
  * Σn²/N obeys its Cauchy-Schwarz floor N/B — a report claiming a
  * cheaper-than-uniform probe would be arithmetically wrong. */
class BucketBalanceSpec extends SparkTestBase {

  test("occupancy partitions the corpus; expected probe cost >= uniform floor") {
    val rows = SparkEntry.queries("ann_bucket_balance")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    assert(rows.nonEmpty && rows.length <= 16)
    assert(rows.map(_._1).distinct.length == rows.length)
    val total = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    rows.foreach { case (b, n, share, skew, _) =>
      assert(b >= 0 && b < 16 && n > 0)
      assert(share > 0.0 && share <= 1.0)
      // skew normalizes by the FULL 16-bucket space (an
      // all-in-one-bucket index must read 16.0, not 1.0)
      assert(skew == BigDecimal(n.toDouble * 16 / total)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"bucket $b: skew $skew != ${n.toDouble * 16 / total}")
    }
    assert(rows.map(_._2).sum == total)
    // one global expected_candidates value, >= N / n_buckets
    val exp = rows.map(_._5).distinct
    assert(exp.length == 1)
    assert(exp.head >= total.toDouble / rows.length - 0.01,
      s"expected candidates ${exp.head} below uniform floor ${total.toDouble / rows.length}")
  }
}
