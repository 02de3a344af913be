package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixFilter
import graft.sources.ViewingData

class PrefixFilterSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute-force truth: all pairs with shingle-set Jaccard ≥ tau. */
  private def brute(docs: Seq[(Long, String)], tau: Double,
      shingle: Int = 2): Set[(Long, Long)] = {
    def grams(t: String): Set[String] =
      t.split(" ").sliding(shingle).filter(_.length == shingle)
        .map(_.mkString(" ")).toSet
    (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      ga = grams(ta); gb = grams(tb) if ga.nonEmpty && gb.nonEmpty
      // the operator filters on the UNROUNDED ratio (exactness
      // contract); the rounded jaccard column is display-only
      j = ga.intersect(gb).size.toDouble / ga.union(gb).size
      if j >= tau
    } yield (ia, ib)).toSet
  }

  test("prefix filtering is COMPLETE: output == brute force on adversarial docs") {
    // clusters of near-dups, partial overlaps straddling the threshold,
    // shared boilerplate grams (high-df elements the prefix must skip),
    // and sub-shingle docs that cannot pair
    val base = "the quick brown fox jumps over the lazy dog near the old barn"
    val docs: Seq[(Long, String)] = Seq(
      1L -> base,
      2L -> base.replace("lazy", "sleepy"),
      3L -> base.replace("quick brown", "slow red"),
      4L -> "completely different words entirely unrelated content here now",
      5L -> "completely different words entirely unrelated content here today",
      6L -> "the quick brown fox", // prefix of cluster 1
      7L -> "one", // sub-shingle: no bigrams
      8L -> base // exact dup of 1
    )
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      val got = PrefixFilter.pairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingle = 2, tau = tau)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(docs, tau), s"tau=$tau: $got vs ${brute(docs, tau)}")
    }
  }

  test("registry row equals the unrestricted brute force on the real corpus") {
    val docs = ViewingData.table(spark, Sf, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val got = SparkEntry.queries("dedup_prefix_filter")(spark, Sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == brute(docs, 0.5, shingle = 3))
    assert(got.nonEmpty, "corpus has planted near-dup pairs")
  }

  test("prefix explode is strictly smaller than the full element explode") {
    // the point of the filter: candidate generation touches only
    // n - ceil(tau*n) + 1 elements per doc — at tau=0.5, about half
    val docs = ViewingData.table(spark, Sf, "documents")
    val full = docs.select(explode(array_distinct(expr(
      """transform(sequence(0, size(split(text, ' ')) - 2),
         i -> array_join(slice(split(text, ' '), i + 1, 2), ' '))"""))))
      .count()
    val n = docs.select(size(array_distinct(expr(
      """transform(sequence(0, size(split(text, ' ')) - 2),
         i -> array_join(slice(split(text, ' '), i + 1, 2), ' '))"""))).as("n"))
      .agg(sum(expr("n - cast(ceil(n * 0.5) as long) + 1"))).head.getLong(0)
    assert(n < full * 6 / 10, s"prefix volume $n vs full $full")
  }
}
