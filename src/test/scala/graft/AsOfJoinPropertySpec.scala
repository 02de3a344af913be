package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.AsOfJoin

/** Property check: the single-shuffle union+window as-of join agrees
  * with the naive per-row scan (for each left row, the right row with
  * the greatest ts <= left ts on the same key) on arbitrary inputs,
  * including duplicate timestamps and keys with no right rows. */
class AsOfJoinPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val genCase: Gen[(List[(Long, String, Long)], List[(String, Long, String)])] = for {
    nl <- Gen.choose(0, 40)
    nr <- Gen.choose(0, 25)
    left <- Gen.listOfN(nl, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 300L)
    } yield (k, t))
    rightRaw <- Gen.listOfN(nr, for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 300L)
    } yield (k, t))
  } yield (
    left.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) },
    // right must be unique per (key, ts) — the operator's contract
    rightRaw.distinct.map { case (k, t) => (k, t, s"p-$k-$t") })

  private def naive(
      left: List[(Long, String, Long)],
      right: List[(String, Long, String)]): Map[Long, Option[String]] =
    left.map { case (id, k, t) =>
      id -> right.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
    }.toMap

  test("as-of join equals the naive scan on 25 random cases") {
    val seed0 = Seed(20260812L)
    var seed = seed0
    for (i <- 1 to 25) {
      val (left, right) = genCase.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val expected = naive(left, right)
      if (left.isEmpty || right.isEmpty) {
        // empty right → a sentinel row under an unmatched key; every
        // left row must carry null (full equality, not just key-set:
        // a carry leak across key groups must fail here)
        if (left.nonEmpty) {
          val out = AsOfJoin.nearestBefore(
            left.toDF("id", "k", "t"),
            Seq(("zz", -1L, "none")).toDF("k", "t", "ref"), // key matches nothing
            "k", "t", Seq("ref"))
            .select("id", "ref").as[(Long, Option[String])].collect().toMap
          assert(out == expected, s"case $i: all-null carry expected, got $out")
        }
      } else {
        val out = AsOfJoin.nearestBefore(
          left.toDF("id", "k", "t"), right.toDF("k", "t", "ref"),
          "k", "t", Seq("ref"))
          .select("id", "ref").as[(Long, Option[String])].collect().toMap
        assert(out == expected, s"case $i: got $out\nexpected $expected")
      }
    }
  }
}
