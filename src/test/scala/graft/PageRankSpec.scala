package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  test("cycle: perfectly symmetric graph keeps uniform rank 1.0") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iterations = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    r.values.foreach(v => assert(math.abs(v - 1.0) < 1e-12, r.toString))
  }

  test("hub-spoke: authorities outrank the hub; hand-computed fixpoint") {
    // A -> B, A -> C and nothing else. B and C are dangling.
    // rank(A) = 0.15 + 0.85 * dangling/3, dangling = rank(B)+rank(C)
    // rank(B) = rank(C) = 0.15 + 0.85*(rank(A)/2 + dangling/3)
    val e = Seq((1L, 2L), (1L, 3L)).toDF("s", "d")
    val r = PageRank.run(e, "s", "d", iterations = 50)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) > r(1L) && math.abs(r(2L) - r(3L)) < 1e-9, r.toString)
    // fixpoint check: plug the returned ranks back into the equations
    val dangling = r(2L) + r(3L)
    assert(math.abs(r(1L) - (0.15 + 0.85 * dangling / 3)) < 1e-6, r.toString)
    assert(math.abs(r(2L) - (0.15 + 0.85 * (r(1L) / 2 + dangling / 3))) < 1e-6)
  }

  test("conservation: rank sum stays N each run, any graph") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 2L), (5L, 1L), (2L, 5L))
      .toDF("s", "d")
    for (iters <- Seq(1, 5, 15)) {
      val sum = PageRank.run(e, "s", "d", iters).agg(org.apache.spark.sql.functions.sum("rank"))
        .head.getDouble(0)
      assert(math.abs(sum - 5.0) < 1e-9, s"iters=$iters sum=$sum")
    }
  }
}
