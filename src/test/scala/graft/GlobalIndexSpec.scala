package graft

import org.apache.spark.sql.functions._

import graft.operators.GlobalIndex
import graft.sources.ViewingData

/** [[operators.GlobalIndex]]: ids must be a 0-based contiguous
  * permutation matching key order, stable across partition counts, and
  * the plan must contain NO single-partition window/sort — the whole
  * point of the operator.
  */
class GlobalIndexSpec extends SparkTestBase {

  test("ids are 0..n-1, contiguous, in key order; stable across partition counts") {
    val docs = ViewingData.table(spark, Sf, "documents").select("doc_id")
    val n = docs.count()
    for (p <- Seq(1, 4, 13)) {
      val got = GlobalIndex.assign(docs, "doc_id", "gid", p)
        .orderBy("gid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length == n)
      assert(got.map(_._2).toSeq == (0L until n).toSeq, s"p=$p: ids not contiguous")
      assert(got.map(_._1).toSeq == got.map(_._1).sorted.toSeq,
        s"p=$p: ids must follow doc_id order")
    }
  }

  test("no global one-partition window: plan has no Window operator") {
    val docs = ViewingData.table(spark, Sf, "documents").select("doc_id")
    val df = GlobalIndex.assign(docs, "doc_id", "gid", 4)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"global index must not plan a window:\n$p")
  }

  test("empty input and single row") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    assert(GlobalIndex.assign(empty, "k", "gid", 4).count() == 0)
    val one = Seq(42L).toDF("k")
    val r = GlobalIndex.assign(one, "k", "gid", 4).collect()
    assert(r.length == 1 && r(0).getLong(1) == 0L)
  }

  test("skewed key space still yields a correct permutation") {
    import spark.implicits._
    // keys clustered in two far-apart clumps — range boundaries land
    // unevenly; correctness must not depend on balance
    val keys = ((1L to 500L) ++ (1000000L to 1000500L)).toDF("k")
    val got = GlobalIndex.assign(keys, "k", "gid", 6)
      .orderBy("gid").collect().map(_.getLong(0))
    assert(got.toSeq == ((1L to 500L) ++ (1000000L to 1000500L)).toSeq)
  }
}
