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

  test("FP-hostile taus stay complete (0.4 / 0.25 / 0.2 — quotients that round UP)") {
    // review finding: ceil over the FP product τ/(1+τ)·(na+nb) (and
    // ceil(τ·n) in the prefix length / length filter) overshoots by 1
    // for taus whose binary rounding lands above the rational value —
    // τ=0.4 with na=3, nb=4: true α = ceil(7·2/7) = 2 but
    // fl(7·0.28571428571428575) = 2.0000000000000004 → ceil 3, dropping
    // a qualifying o=2 pair. The ratio-form filters must keep it.
    // Docs engineered so the adversarial (na=3, nb=4, o=2) shape exists:
    // bigram sets {ab, bc, cd} and {ab, bc, ce, ef} share exactly 2.
    val docs: Seq[(Long, String)] = Seq(
      1L -> "a b c d",      // bigrams: ab, bc, cd  (na=3)
      2L -> "a b c e f",    // bigrams: ab, bc, ce, ef  (nb=4), o=2, J=2/5=0.4
      3L -> "x y z w",      // unrelated
      4L -> "x y z q r",    // o=2 with 3 at J=2/5
      5L -> "a b c d",      // exact dup of 1
      6L -> "p q",          // single bigram
      7L -> "p q s t u v w x y z a" // low-J partner for 6
    )
    for (tau <- Seq(0.4, 0.25, 0.2, 1.0 / 3.0)) {
      val got = PrefixFilter.pairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingle = 2, tau = tau)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == brute(docs, tau), s"tau=$tau: $got vs ${brute(docs, tau)}")
    }
    // the J=0.4 pair specifically must survive at τ=0.4
    val at04 = PrefixFilter.pairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingle = 2, tau = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(at04.contains((1L, 2L)), "the boundary o=2 pair must not be dropped")
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

  test("maxDf cap: capped ⊆ exact; retained-overlap contract; clusters survive") {
    // Degenerate corpus: 30 docs sharing an 11-word boilerplate block
    // (10 bigrams, df≥30 each) + unique 3-gram tails. Their pairwise
    // J = 10/16 = 0.625 ≥ τ purely through boilerplate — the C(30,2)
    // quadratic a production corpus must not pay. Plus one genuine
    // near-dup pair overlapping on 8 UNCOMMON grams (df=2), and the
    // ADVERSARIAL shape from the recall-contract review: a pair
    // (201, 202) qualifying mostly through boilerplate but sharing
    // exactly ONE sub-cap gram (the "details rarepair" bridge
    // bigram, df=2). Its retained overlap (1) is far below
    // ceil(τ·max(n_full)) (7), so the provable contract ALLOWS the
    // cap to drop it — the old "misses only all-boilerplate pairs"
    // claim was false on precisely this shape.
    val boiler = "terms of service apply all rights reserved contact us for details"
    val noise = (1L to 30L).map(i => i -> s"$boiler unique$i tail$i words$i")
    val dupA = 101L -> "galactic survey results show anomalous readings near sector seven"
    val dupB = 102L -> "galactic survey results show anomalous readings near sector nine"
    val mixA = 201L -> s"$boiler rarepair alpha1 alpha2 alpha3"
    val mixB = 202L -> s"$boiler rarepair beta1 beta2 beta3"
    val docs: Seq[(Long, String)] = noise ++ Seq(dupA, dupB, mixA, mixB)
    val tau = 0.5
    val cap = 8
    val exact = PrefixFilter.pairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingle = 2, tau = tau)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val capped = PrefixFilter.pairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingle = 2, tau = tau, maxDf = cap)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact == brute(docs, tau), "uncapped stays the exact PPJoin")
    assert(capped.subsetOf(exact), "the cap may only DROP pairs, never invent")
    assert(capped.contains((101L, 102L)),
      "near-dups pairing through uncommon grams must survive the cap")
    assert(exact.contains((201L, 202L)),
      "adversarial pair must qualify on full sets (corpus shape check)")
    def grams(t: String): Set[String] =
      t.split(" ").sliding(2).map(_.mkString(" ")).toSet
    val byId = docs.toMap
    val dfTab = docs.flatMap { case (_, t) => grams(t) }
      .groupBy(identity).map { case (g, occ) => g -> occ.size }
    // THE CONTRACT, both directions, over every exact pair:
    //   retained shared count ≥ ceil(τ·max(n_full)) ⇒ pair is caught;
    //   pair missed ⇒ retained shared count below the bound (its
    //   qualifying overlap leaned on capped grams).
    val missed = exact -- capped
    assert(missed.nonEmpty, "test corpus must exercise the miss case")
    assert(missed.contains((201L, 202L)),
      "the one-sub-cap-gram adversarial pair is the shape the cap may drop")
    exact.foreach { case (a, b) =>
      val ga = grams(byId(a)); val gb = grams(byId(b))
      val retainedShared = ga.intersect(gb).count(g => dfTab(g) <= cap)
      val bound = math.ceil(tau * math.max(ga.size, gb.size)).toInt
      if (retainedShared >= bound)
        assert(capped.contains((a, b)),
          s"pair ($a,$b) meets the retained-overlap bound ($retainedShared >= $bound) but was dropped")
      if (missed.contains((a, b)))
        assert(retainedShared < bound,
          s"missed pair ($a,$b) had retained overlap $retainedShared >= bound $bound — contract broken")
    }
    intercept[IllegalArgumentException] {
      PrefixFilter.pairs(docs.toDF("doc_id", "text"),
        "doc_id", "text", shingle = 2, tau = tau, maxDf = 1)
    }
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
