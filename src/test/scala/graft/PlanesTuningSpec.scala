package graft

/** E15 `ann_planes_tuning` — the planes-count knob. The oracle pins
  * the arithmetic; this spec pins the refinement law that makes the
  * table a monotone trade: the p-plane bucket is the (p−1)-plane
  * bucket plus one more agreed bit, so each added plane can only
  * SHRINK a query's candidate set — per query, candidates and hits
  * are monotone non-increasing in planes (hits by the same
  * at-most-9-displacers argument as E14). */
class PlanesTuningSpec extends SparkTestBase {
  import spark.implicits._

  test("each added plane shrinks candidates and cannot add hits") {
    val rows = SparkEntry.queries("ann_planes_tuning")(spark, Sf)
      .select("planes", "query_id", "n_candidates", "hits")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._2).map { case (q, rs) => q -> rs.sortBy(_._1) }
    assert(rows.nonEmpty)
    rows.foreach { case (q, byPlanes) =>
      assert(byPlanes.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
      byPlanes.sliding(2).foreach { case Array(coarse, fine) =>
        assert(fine._3 <= coarse._3,
          s"query $q: p=${fine._1} candidates ${fine._3} > p=${coarse._1}'s ${coarse._3}")
        assert(fine._4 <= coarse._4,
          s"query $q: p=${fine._1} hits ${fine._4} > p=${coarse._1}'s ${coarse._4}")
      }
      byPlanes.foreach { case (_, _, nc, h) => assert(h <= 10 && h <= nc) }
    }
  }
}
