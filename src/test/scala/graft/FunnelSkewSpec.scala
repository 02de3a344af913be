package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** q_funnel hot-user skew: the per-user pair loop inside the two range
  * joins is bounded by the 1-hour window, but a pathological user with
  * thousands of views AND clicks inside one hour still pays
  * |views|×|clicks| pair comparisons for that key. This spec crafts
  * exactly that user (1000×1000 in-window pairs on one key, three
  * orders of magnitude denser than the synthetic feed) and pins that
  * the earliest-match semantics stay exact — the skew costs time on
  * one partition, never correctness. PLANS.md (round 5) documents the
  * bound and the mitigation ladder.
  */
class FunnelSkewSpec extends SparkTestBase {
  import spark.implicits._

  test("a 1000x1000 in-window hot user keeps earliest-match exact") {
    val tmp = Files.createTempDirectory("funnelskew").toString
    val base = 1700000000L
    def ev(id: Long, t: Long, user: Long, typ: String) =
      (id, new Timestamp(t * 1000L), user, typ, 10.0, "{}")
    // hot user 1: every view converts (first click = max(500, t+1)),
    // and the single purchase at +1600 converts all of them
    val hot =
      (0L until 1000L).map(i => ev(i, base + i, 1L, "view")) ++
      (0L until 1000L).map(i => ev(2000L + i, base + 500L + i, 1L, "click")) ++
      Seq(ev(4000L, base + 1600L, 1L, "purchase"))
    // user 2: one view, no click — must not convert
    val cold = Seq(ev(5000L, base, 2L, "view"))
    (hot ++ cold)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$tmp/events.parquet")

    val out = SparkEntry.queries("q_funnel")(spark, tmp)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(out == ((1001L, 1000L, 1000L, 0.999001, 1.0)),
      s"funnel counts must survive the hot user exactly: $out")
  }
}
