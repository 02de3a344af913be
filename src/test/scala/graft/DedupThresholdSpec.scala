package graft

/** D20 `dedup_threshold_report` — the τ-calibration histogram. The
  * DuckDB oracle pins the arithmetic; this spec pins the report's
  * meaning: the cumulative column is the suffix sum, and reading the
  * histogram at D2's τ reproduces D2's pair count exactly — the
  * "how many pairs would τ merge?" contract the artifact exists
  * for. */
class DedupThresholdSpec extends SparkTestBase {

  test("histogram tail at τ equals the filtered dedup row's pair count") {
    val rows = SparkEntry.queries("dedup_threshold_report")(spark, Sf)
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.nonEmpty && rows.forall { case (b, n, _) =>
      b >= 0.0 && b <= 0.9 && n > 0 })
    // n_pairs_ge is the suffix sum of n_pairs (descending buckets)
    rows.foreach { case (b, _, ge) =>
      val suffix = rows.filter(_._1 >= b).map(_._2).sum
      assert(ge == suffix, s"bucket $b: n_pairs_ge $ge != suffix $suffix")
    }
    // the calibration promise: the tail at D2's τ IS D2's merge count.
    // PRECONDITION the equality rests on: τ sits on a 0.1 bucket
    // boundary — a retune to e.g. 0.35 must also refine the report's
    // bucket width, and this assert is the loud failure that says so
    assert((QueriesML.NgramTau * 10) == math.floor(QueriesML.NgramTau * 10),
      s"NgramTau ${QueriesML.NgramTau} is not a 0.1-bucket boundary — " +
        "refine dedup_threshold_report's bucket width along with it")
    val atTau = rows.filter(_._1 >= QueriesML.NgramTau).map(_._2).sum
    val d2 = SparkEntry.queries("dedup_ngram_jaccard")(spark, Sf).count()
    assert(atTau == d2,
      s"histogram tail at τ=${QueriesML.NgramTau} ($atTau) must equal dedup_ngram_jaccard's $d2 pairs")
  }
}
