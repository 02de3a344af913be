package graft

/** D21 `dedup_lsh_tuning` — the (b × r) banding calibration report.
  * The DuckDB oracle pins the arithmetic; this spec pins the report's
  * structural promises: candidate sets NEST as rows-per-band halves
  * (a 2r-row band hash equality implies both r-row sub-band
  * equalities — md5 over the concatenated mins — so cand(2r) ⊆
  * cand(r)), which the reader consumes as "recall can only improve,
  * candidates can only grow, as bands get finer". */
class LshTuningSpec extends SparkTestBase {

  test("tuning report: nested configs, consistent counts, exact ratio columns") {
    val rows = SparkEntry.queries("dedup_lsh_tuning")(spark, Sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .sortBy(_._2) // ascending rows_per_band: 2, 4, 8, 16
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((8L, 2L), (4L, 4L), (2L, 8L), (1L, 16L)))
    // one truth set for every config
    assert(rows.map(_._3).distinct.size == 1)
    rows.foreach { case (b, r, nTrue, nCand, nHits, recall, prec) =>
      assert(nHits <= nCand, s"config ${b}x$r: hits $nHits > candidates $nCand")
      assert(nHits <= nTrue, s"config ${b}x$r: hits $nHits > truth $nTrue")
      assert(recall == BigDecimal(nHits.toDouble / math.max(nTrue, 1L))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(prec == BigDecimal(nHits.toDouble / math.max(nCand, 1L))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // nesting: coarser bands (larger r) generate a SUBSET of the finer
    // config's candidates — counts and hits are monotone non-increasing
    // in rows-per-band
    rows.sliding(2).foreach { case Array(fine, coarse) =>
      assert(coarse._4 <= fine._4,
        s"candidates must nest: r=${coarse._2} has ${coarse._4} > r=${fine._2}'s ${fine._4}")
      assert(coarse._5 <= fine._5,
        s"hits must nest: r=${coarse._2} has ${coarse._5} > r=${fine._2}'s ${fine._5}")
    }
  }
}
