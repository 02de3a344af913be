package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Sessionize

/** Property check: the distributed sessionizer agrees with a naive
  * single-threaded reference implementation on arbitrary event sets.
  * (Plain ScalaCheck Gen + fixed seeds — scalatestplus isn't on the
  * offline classpath.) */
class SessionizePropertySpec extends SparkTestBase {
  import spark.implicits._

  private val genEvents: Gen[List[SessEv]] = for {
    n <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, for {
      key <- Gen.oneOf("a", "b", "c")
      start <- Gen.choose(0L, 5000L)
      len <- Gen.choose(0L, 400L)
      dur <- Gen.choose(0L, 250L)
    } yield (key, start, start + len, dur))
  } yield evs.zipWithIndex.map { case ((k, s0, e, d), i) => SessEv(k, i.toLong, s0, e, d) }

  /** Reference implementation: literal transliteration of the rule
    * (sorted fold, gap from previous END, cumulative breaks, HAVING). */
  private def naive(evs: List[SessEv], gap: Long, minDur: Long): Set[(String, Long, Long, Long)] =
    evs.groupBy(_.key).toList.flatMap { case (k, g) =>
      val sorted = g.sortBy(e => (e.start, e.end, e.id))
      val withGap = sorted.zip(None +: sorted.map(Some(_)))
        .map { case (e, prev) => (e, prev.map(p => e.start - p.end)) }
      var sid = 0L
      val ids = withGap.map { case (e, gp) =>
        if (gp.isEmpty || gp.exists(_ > gap)) sid += 1
        (e, sid)
      }
      ids.groupBy(_._2).values.map { ses =>
        val es = ses.map(_._1)
        (k, es.map(_.start).min, es.map(_.end).max, es.map(_.dur).sum)
      }.filter(_._4 >= minDur)
    }.toSet

  test("distributed sessions == naive reference on random inputs") {
    (1 to 25).foreach { i =>
      val evs = genEvents.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val expected = naive(evs, gap = 100L, minDur = 50L)
      val actual =
        if (evs.isEmpty) Set.empty
        else Sessionize.sessions(
          evs.toDF(), keys = Seq("key"),
          startCol = "start", endCol = "end", durationCol = "dur",
          gapSeconds = 100L, minSessionSeconds = 50L,
          tieBreakers = Seq("end", "id"))
          .select("key", "session_start_ts", "session_end_ts", "total_duration")
          .as[(String, Long, Long, Long)].collect().toSet
      assert(actual == expected, s"seed $i: events $evs")
    }
  }
}

// top-level so the product Encoder has no outer reference
private[graft] case class SessEv(key: String, id: Long, start: Long, end: Long, dur: Long)
