package graft

/** E14 `ann_multiprobe_recall` vs E12 `ann_recall_report` — the
  * multi-probe dominance law. Multiprobe's candidate set is a strict
  * superset of the single-bucket probe's (it contains the query's own
  * bucket), and a candidate in the exact top-10 can be displaced by
  * at most 9 globally-better vectors — so per query BOTH candidates
  * and hits are monotone ≥ the single-probe row. The oracle pins each
  * report's arithmetic; this spec pins the relationship between them
  * that makes E14 a recall KNOB rather than a different index. */
class MultiprobeSpec extends SparkTestBase {
  import spark.implicits._

  test("multiprobe dominates single-probe per query: candidates and hits") {
    def rows(name: String) = SparkEntry.queries(name)(spark, Sf)
      .select("query_id", "n_candidates", "hits")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val single = rows("ann_recall_report")
    val multi = rows("ann_multiprobe_recall")
    assert(single.keySet == multi.keySet && single.nonEmpty)
    single.foreach { case (q, (nc1, h1)) =>
      val (ncM, hM) = multi(q)
      assert(ncM >= nc1, s"query $q: multiprobe candidates $ncM < single $nc1")
      assert(hM >= h1, s"query $q: multiprobe hits $hM < single $h1")
      assert(hM <= 10 && ncM >= hM)
    }
    // the knob must actually buy something on the fixture
    assert(multi.values.map(_._2).sum > single.values.map(_._2).sum,
      "fixture must show a recall gain")
  }
}
