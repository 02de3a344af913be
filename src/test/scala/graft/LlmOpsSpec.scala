package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Discriminating cases for the corpus-hygiene operators: the synthetic
  * corpus rarely triggers them, so repetition / contamination / PII
  * semantics are pinned here on crafted documents. */
class LlmOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("wordNgrams: ordered n-grams, short docs yield empty") {
    val toks = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .select(col("id"), TextFunctions.tokens(col("text")).as("toks"))
    val out = toks.select(col("id"),
      TextFunctions.wordNgrams(col("toks"), 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) == Seq("a b c", "b c d"))
    assert(out(2L) == Seq.empty)
  }

  test("dupNgramRatio: looping text scores high, unique text zero") {
    // "a b c" ×3 → 7 trigrams, 3 distinct → 1 - 3/7
    val df = Seq(
      (1L, "a b c a b c a b c"),
      (2L, "one two three four five"),
      (3L, "x y")).toDF("id", "text")
      .select(col("id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("id"), TextFunctions.wordNgrams(col("toks"), 3).as("tris"))
      .select(col("id"), TextFunctions.dupNgramRatio(col("tris")).as("r"))
    val r = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - (1.0 - 3.0 / 7.0)) < 1e-6)
    assert(r(2L) == 0.0)
    assert(r(3L) == 0.0) // too short for any trigram
  }

  test("piiScrub: redacts emails, phones, IPs; counts match") {
    val doc = "reach me at jane.doe+x@corp.example.org or +1 555-123-4567; " +
      "server 192.168.0.1 mirrors 10.0.0.7, ok?"
    val out = Seq((1L, doc)).toDF("id", "text").select(
      regexp_count(col("text"), lit(TextFunctions.EmailRe)).as("e"),
      regexp_count(col("text"), lit(TextFunctions.PhoneRe)).as("p"),
      regexp_count(col("text"), lit(TextFunctions.IpRe)).as("i"),
      TextFunctions.piiScrub(col("text")).as("s")).head()
    assert(out.getInt(0) == 1 && out.getInt(1) == 1 && out.getInt(2) == 2)
    val s = out.getString(3)
    assert(s.contains("<EMAIL>") && s.contains("<PHONE>") && s.contains("<IP>"))
    assert(!s.contains("@") && !s.contains("555") && !s.contains("192.168"))
    assert(s.contains("ok?")) // non-PII text untouched
  }

  test("piiScrub: bare US phone forms redact WHOLE, no leaked digits") {
    // a mandatory country-code prefix would eat two area-code digits
    // ("55-123-4567" matched, "5" leaked) — pin the common forms
    for (form <- Seq("555-123-4567", "(555) 123-4567", "555.123.4567",
        "+1 555-123-4567", "15551234567")) {
      val s = Seq(Tuple1(s"call $form now")).toDF("text")
        .select(TextFunctions.piiScrub(col("text")).as("s"))
        .head().getString(0)
      assert(s == "call <PHONE> now", s"form '$form' scrubbed to '$s'")
    }
  }

  test("decontaminate matches an independent driver-side recomputation") {
    // independent oracle: recompute the expected overlap in plain
    // Scala over the collected corpus (sf0.01 — it contains a genuine
    // cross-doc 5-gram overlap, so the positive path is exercised)
    val sf01 = "/root/testdata/sf0.01"
    val docs = graft.sources.ViewingData.table(spark, sf01, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+"))
    def grams(toks: Array[String]): Set[String] =
      if (toks.length < 5) Set.empty
      else toks.sliding(5).map(_.mkString(" ")).toSet
    val testGrams = docs.filter(_._1 % 97 == 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filter(_._1 % 97 != 0).map { case (id, toks) =>
      id -> (grams(toks) & testGrams).size.toLong
    }.toMap

    val out = SparkEntry.queries("text_decontaminate")(spark, sf01)
      .select("doc_id", "n_contaminated", "contaminated").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out.keySet == expected.keySet)
    assert(out.forall { case (id, (n, flag)) =>
      n == expected(id) && flag == (expected(id) > 0) })
    // the corpus really contains a positive case — this test is not
    // passable by an operator that flags nothing
    assert(expected.values.exists(_ > 0))
  }

  test("corpus_shuffle: deterministic, uniform-ish across shards") {
    val a = SparkEntry.queries("corpus_shuffle")(spark, Sf).collect()
    val b = SparkEntry.queries("corpus_shuffle")(spark, Sf).collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
    val byShard = a.groupBy(_.getString(2)).view.mapValues(_.length)
    // 256 possible shards; no shard should swallow the corpus
    assert(byShard.values.max < a.length / 4)
  }

  test("text_quality_model: exact-integer margin, deterministic, both verdicts") {
    val out = SparkEntry.queries("text_quality_model")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // margin is the exact integer identity, verdict is its sign
    out.foreach { case (id, n, raw, margin, verdict) =>
      assert(margin == 2 * raw - 255 * n, s"doc $id margin identity")
      assert(raw >= 0 && raw <= 255 * n, s"doc $id raw out of weight range")
      assert(verdict == (if (margin > 0) "keep" else "drop"), s"doc $id verdict")
    }
    // per-byte pseudo-weights split a real corpus both ways
    assert(out.exists(_._5 == "keep") && out.exists(_._5 == "drop"))
    // inference is a pure projection: deterministic across runs
    val again = SparkEntry.queries("text_quality_model")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    out.foreach { case (id, _, raw, _, _) => assert(again(id) == raw) }
    // and shuffle-free: no exchange anywhere in the plan
    val plan = SparkEntry.queries("text_quality_model")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scan-speed inference must not shuffle:\n$plan")
  }

  test("corpus_prep_incremental: first-arrival survivorship — standing always wins") {
    // the ONE semantic the DuckDB parity can never catch (both sides
    // share it): a delta doc duplicating a STANDING doc must be
    // dropped even when its id is SMALLER — min-id canonical would
    // evict the already-published standing copy, leaving the combined
    // corpus carrying both near-dups and breaking the dedup-clean
    // invariant the next increment relies on (review finding).
    val passText = "the quick brown fox and the lazy dog ran to the " +
      "old barn in a field with many birds on it near the river"
    def writeDocs(rows: Seq[(Long, String, String, String, Long)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("prepinc").toString
      rows.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
      dir
    }
    // doc 0 (delta, SMALLER id) exactly duplicates doc 1 (standing):
    // same text, same (lang, n_chars) block -> Jaccard 1.0
    val dirWithStanding = writeDocs(Seq(
      (0L, passText, "en", "web", 100L),
      (1L, passText, "en", "web", 100L)))
    val out1 = SparkEntry.queries("corpus_prep_incremental")(spark, dirWithStanding)
      .select("doc_id").as[Long].collect().toSet
    assert(!out1.contains(0L),
      "delta doc duplicating standing must be dropped despite the smaller id")
    // vacuity guard: without the standing dup, the SAME doc 0 passes
    // the gate and ships — proving the first assertion tested the
    // survivorship rule, not a gate rejection
    val dirAlone = writeDocs(Seq((0L, passText, "en", "web", 100L)))
    val out2 = SparkEntry.queries("corpus_prep_incremental")(spark, dirAlone)
      .select("doc_id").as[Long].collect().toSet
    assert(out2 == Set(0L), s"doc 0 must pass the gate solo, got $out2")
    // intra-delta tie rule unchanged: two delta-only dups keep min id
    val dirDeltaOnly = writeDocs(Seq(
      (4L, passText, "en", "web", 100L),
      (8L, passText, "en", "web", 100L)))
    val out3 = SparkEntry.queries("corpus_prep_incremental")(spark, dirDeltaOnly)
      .select("doc_id").as[Long].collect().toSet
    assert(out3 == Set(4L), s"min delta id survives delta-only components, got $out3")
  }
}
