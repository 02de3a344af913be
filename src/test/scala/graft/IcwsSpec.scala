package graft

import org.apache.spark.sql.functions._

import graft.operators.Icws
import graft.sources.ViewingData

/** ICWS weighted MinHash (D19) — the properties the rows-only
  * registry row rests on: the collision-rate estimator is J_w, the
  * banded candidates recall the unblocked exact result, and the
  * weighted semantics actually separate what set Jaccard conflates. */
class IcwsSpec extends SparkTestBase {
  import spark.implicits._

  test("collision rate across signatures estimates weighted Jaccard") {
    // tf vectors {x:4, y:1} vs {x:2, y:3}: Σmin = 2+1 = 3,
    // Σmax = 4+3 = 7 → J_w = 3/7 ≈ 0.4286. With h=256 samples the
    // match-fraction std is √(p(1−p)/256) ≈ 0.031 — assert within 3σ.
    val docs = Seq((1L, "x x x x y"), (2L, "x x y y y")).toDF("doc_id", "text")
    val sigs = Icws.signatures(docs, "doc_id", "text", h = 256)
      .as[(Long, Seq[Long])].collect().toMap
    val matches = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b }
    val rate = matches / 256.0
    assert(math.abs(rate - 3.0 / 7.0) < 0.095,
      s"collision rate $rate should estimate J_w=${3.0 / 7.0}")
  }

  test("identical docs collide on every sample; disjoint docs on none") {
    val docs = Seq(
      (1L, "alpha beta beta gamma"),
      (2L, "alpha beta beta gamma"),
      (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val sigs = Icws.signatures(docs, "doc_id", "text", h = 32)
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(2L), "J_w = 1 must collide everywhere")
    assert(sigs(1L).zip(sigs(3L)).forall { case (a, b) => a != b },
      "J_w = 0 (disjoint vocab) can never collide — samples are own-vocab words")
  }

  test("registry row ⊆ blocked exact result at the same tau, with high recall") {
    // the registry row composes the (lang, n_chars) blocks into the
    // band key (Icws.candidates scaladoc: the corpus's background
    // J_w ≈ 0.5 sits too close to the threshold for banding alone),
    // so its reference set is the BLOCKED exact result — D18's
    // candidate discipline at D19's τ = 0.55 (the blocked-pair J_w
    // ceiling here is ≈ 0.61, so 0.7 would be vacuous)
    val d = ViewingData.table(spark, Sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .localCheckpoint()
    val docs = d.select("doc_id", "text")
    val blocked = d.as("a").join(d.as("b"),
        expr("a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val exact = QueriesML.weightedJaccardVerify(docs, blocked, 0.55)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = SparkEntry.queries("dedup_icws")(spark, Sf)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(exact),
      s"verification must keep the output inside exact: ${got -- exact}")
    assert(exact.nonEmpty, "corpus must contain qualifying weighted pairs")
    val recall = got.size.toDouble / exact.size
    assert(recall >= 0.7,
      s"8×2 bands at J_w≥0.55 predict ≈0.94 per-pair recall, measured $recall")
  }

  test("the draw chain stays inside whole-stage codegen (strict, no fallback)") {
    // the whole point of the xxhash64 plain-column formulation
    // (PLANS.md round-9 forensics: the let-bound HOF form evaluated
    // interpreted at 9.2 s / 1.9M rows) — regressions that knock the
    // draw out of codegen must throw here, not silently cost 4×
    withStrictCodegen {
      val docs = Seq((1L, "alpha beta beta"), (2L, "beta gamma")).toDF("doc_id", "text")
      assert(Icws.signatures(docs, "doc_id", "text", h = 8).count() == 2)
    }
  }

  test("band geometry that does not tile the signature is refused") {
    // oversized bands×rows would slice past the array and give every
    // doc the empty band key — a silent quadratic pairing explosion;
    // undersized silently ignores tail samples. Both must throw.
    val docs = Seq((1L, "alpha beta"), (2L, "beta gamma")).toDF("doc_id", "text")
    val sigs = Icws.signatures(docs, "doc_id", "text", h = 16).localCheckpoint()
    intercept[IllegalArgumentException] {
      Icws.candidates(sigs, "doc_id", bands = 8, rowsPerBand = 3)
    }
    intercept[IllegalArgumentException] {
      Icws.candidates(sigs, "doc_id", bands = 4, rowsPerBand = 2)
    }
    assert(Icws.candidates(sigs, "doc_id", bands = 8, rowsPerBand = 2)
      .count() >= 0) // exact tiling passes
  }

  test("Nil blocking prunes on bands alone when the background is genuinely dissimilar") {
    // the registry row composes (lang, n_chars) blocks because THIS
    // corpus's background J_w ≈ 0.5 sits next to the threshold; the
    // candidates scaladoc documents blockCols = Nil as safe on corpora
    // with low background similarity — pin that claim on a synthetic
    // CLUSTERED corpus: 3 clusters × 10 docs, disjoint vocabularies
    // across clusters (background J_w = 0), high within-cluster J_w.
    val docs = (for {
      c <- 0 until 3
      j <- 0 until 10
    } yield {
      val words = (0 until 8).map(k => s"c${c}w$k")
      // tf vector shared across the cluster, one word's count varying
      // mildly per doc: J_w within a cluster stays >= ~0.85
      val text = words.zipWithIndex.flatMap { case (w, k) =>
        Seq.fill(3 + (if (k == j % 8) 1 else 0))(w)
      }.mkString(" ")
      (c * 100L + j, text)
    }).toDF("doc_id", "text")
    val sigs = Icws.signatures(docs, "doc_id", "text", h = 16).localCheckpoint()
    val cand = Icws.candidates(sigs, "doc_id", bands = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidate volume: bounded by within-cluster pairs — banding alone
    // must prune every cross-cluster pair (disjoint vocab can never
    // collide on a sample, so a band key match is impossible)
    assert(cand.forall { case (a, b) => a / 100 == b / 100 },
      s"cross-cluster candidates must be pruned: ${cand.filterNot { case (a, b) => a / 100 == b / 100 }.take(5)}")
    assert(cand.size <= 3 * 45, s"candidate volume ${cand.size} must stay within-cluster")
    // recall: within-cluster pairs sit at J_w >= ~0.85; 8x2 bands give
    // per-pair all-miss probability (1 - J_w^2)^8 <= ~1e-4 — demand 0.9
    val within = (for {
      c <- 0 until 3; i <- 0 until 10; j <- (i + 1) until 10
    } yield (c * 100L + i, c * 100L + j)).toSet
    val recall = cand.intersect(within).size.toDouble / within.size
    assert(recall >= 0.9, s"banding alone must recall clustered near-dups, got $recall")
  }

  test("weighted semantics separate what set Jaccard conflates") {
    // same vocabulary, opposite emphasis: set J = 1.0, J_w = 1/3
    val docs = Seq((1L, "a a a b"), (2L, "a b b b")).toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("id_a", "id_b")
    val jw = QueriesML.weightedJaccardVerify(docs, cand, 0.0)
      .select("weighted_jaccard").as[Double].head()
    assert(math.abs(jw - 1.0 / 3.0) < 1e-6, s"J_w must be 1/3, got $jw")
  }
}
