package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** [[operators.BpeTrain]] against an independent in-test reference:
  * the naive single-machine BPE (Sennrich et al.'s pseudocode,
  * implemented directly on a Map) must produce the identical merge
  * sequence — a check strictly stronger than a row-count, playing
  * the role the DuckDB oracle plays for SQL-expressible rows (the
  * iterative argmax isn't SQL). */
class BpeTrainSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference BPE: same tie rule (count desc, then lexicographic). */
  private def naive(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    def applyMerge(syms: Vector[String], a: String, b: String): Vector[String] =
      syms.foldLeft(Vector.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toVector }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var continue = true
    while (out.length < n && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        if (syms.length >= 2)
          syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) continue = false
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        vocab = vocab.toSeq.map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
          .groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def wordsOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap

  test("classic example: learned merges equal the reference sequence") {
    val docs = Seq.fill(5)("low").++(Seq.fill(2)("lower"))
      .++(Seq.fill(6)("newest")).++(Seq.fill(3)("widest"))
      .map(w => Tuple1(w)).toDF("text")
    val got = BpeTrain.train(docs, "text", 8).map(m => (m.left, m.right, m.pairCount))
    val want = naive(Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L), 8)
    assert(got == want, s"got=$got want=$want")
    // sanity anchors from the paper's walk-through shape: first merge
    // is the most frequent adjacent pair across newest+widest
    assert(got.head._3 == 9L, s"first merge weight: ${got.head}")
  }

  test("real corpus: distributed training equals the reference, deterministically") {
    val docs = graft.sources.ViewingData.table(spark, Sf, "documents")
      .limit(200).localCheckpoint()
    val a = BpeTrain.train(docs, "text", 12)
    val want = naive(wordsOf(docs), 12)
    assert(a.map(m => (m.left, m.right, m.pairCount)) == want,
      s"got=${a.map(m => (m.left, m.right, m.pairCount))} want=$want")
    val b = BpeTrain.train(docs, "text", 12)
    assert(a == b, "training must be deterministic across runs")
  }

  test("distributed rounds equal the bounded driver-local fast path exactly") {
    // the r12 fast path (Components tryLocalSolve discipline) collects
    // a ≤ localMaxVocab vocabulary and runs the merge loop driver-side;
    // localMaxVocab = 0 forces the distributed rounds on the same
    // corpus — merges AND final segmentation must be identical (exact
    // integer counts, UTF-8-byte tie-break, same greedy fold)
    val docs = graft.sources.ViewingData.table(spark, Sf, "documents")
      .limit(200).localCheckpoint()
    val (mLocal, segLocal) = BpeTrain.trainAndSegment(docs, "text", 12)
    val (mDist, segDist) =
      BpeTrain.trainAndSegment(docs, "text", 12, localMaxVocab = 0L)
    assert(mLocal == mDist, s"local=$mLocal dist=$mDist")
    val a = segLocal.as[(String, Seq[String])].collect().toMap
    val b = segDist.as[(String, Seq[String])].collect().toMap
    assert(a == b, "segmentations must match between paths")
    // and the saved-merges replay path agrees between its two regimes
    val sa = BpeTrain.segmentVocabulary(docs, "text", mLocal)
      .as[(String, Seq[String])].collect().toMap
    val sb = BpeTrain.segmentVocabulary(docs, "text", mLocal, localMaxVocab = 0L)
      .as[(String, Seq[String])].collect().toMap
    assert(sa == sb, "segmentVocabulary regimes must match")
  }

  test("driver-local probe bounds SYMBOLS, not just words (long-word corpus)") {
    // r12 ADVICE: localMaxVocab bounded the word COUNT while the
    // driver collect's real cost is the symbol arrays — a corpus of
    // few but very long words must fail the probe (and take the
    // distributed path, with identical results).
    val longWord = "ab" * 600 // 1200 symbols/word, natural-word outlier
    val docs = (Seq.fill(4)(longWord) ++ Seq.fill(5)("low") ++
      Seq.fill(6)("newest")).map(Tuple1(_)).toDF("text")
    val vocab = BpeTrain.vocabulary(docs, "text")
    // 3 words, 1200+3+6 = 1209 symbols: the word bound alone passes...
    assert(BpeTrain.fitsOnDriver(vocab, "syms", localMaxVocab = 1L << 16))
    // ...but a symbol budget below the total refuses the collect —
    // the quantity the probe guards is driver memory, not row count
    assert(!BpeTrain.fitsOnDriver(vocab, "syms", localMaxVocab = 1L << 16,
      maxSyms = 1000L))
    // and both paths still agree on this corpus
    val (mFast, segFast) = BpeTrain.trainAndSegment(docs, "text", 6)
    val (mDist, segDist) =
      BpeTrain.trainAndSegment(docs, "text", 6, localMaxVocab = 0L)
    assert(mFast == mDist)
    assert(segFast.as[(String, Seq[String])].collect().toMap ==
      segDist.as[(String, Seq[String])].collect().toMap)
  }

  test("empty and whitespace-only docs: no phantom symbols, reference parity") {
    // tokens('') = [''] — the empty word must contribute NO adjacent
    // pairs (chars('') is an empty array, not two phantom '' symbols
    // from sequence(1,0)'s descending default)
    val docs = (Seq.fill(20)("") ++ Seq.fill(3)("   ") ++
      Seq.fill(5)("low") ++ Seq.fill(6)("newest"))
      .map(Tuple1(_)).toDF("text")
    val got = BpeTrain.train(docs, "text", 5).map(m => (m.left, m.right, m.pairCount))
    assert(!got.exists(m => m._1.isEmpty || m._2.isEmpty),
      s"no merge may involve the empty symbol: $got")
    val want = naive(Map("" -> 23L, "low" -> 5L, "newest" -> 6L), 5)
    assert(got == want, s"got=$got want=$want")
  }

  test("segmentVocabulary: segments concatenate back to the word, merges applied") {
    val docs = graft.sources.ViewingData.table(spark, Sf, "documents")
      .limit(200).localCheckpoint()
    val merges = BpeTrain.train(docs, "text", 12)
    val seg = BpeTrain.segmentVocabulary(docs, "text", merges)
      .as[(String, Seq[String])].collect()
    assert(seg.nonEmpty)
    seg.foreach { case (w, parts) =>
      assert(parts.mkString == w, s"$w segmented to $parts")
    }
    // at least one real merge happened: some word has fewer segments
    // than characters
    assert(seg.exists { case (w, parts) => parts.length < w.length })
  }

  test("saved merges: round-trip, and a NEW corpus slice segments identically") {
    import org.apache.spark.sql.functions.col
    val all = graft.sources.ViewingData.table(spark, Sf, "documents")
    val trainDocs = all.filter(col("doc_id") < 200).localCheckpoint()
    val serveDocs = all.filter(col("doc_id") >= 200).localCheckpoint()
    val merges = BpeTrain.train(trainDocs, "text", 12)
    val path = java.nio.file.Files.createTempDirectory("bpe").toString + "/merges"
    BpeTrain.saveMerges(spark, merges, path)
    assert(BpeTrain.loadMerges(spark, path) == merges,
      "rank-ordered round-trip must reproduce the merge list exactly")
    // the tokenize-once/segment-everywhere split: documents the
    // trainer never saw segment under the STORED artifact exactly as
    // under the in-memory merges
    def segMap(ms: Seq[BpeTrain.Merge]) =
      BpeTrain.segmentVocabulary(serveDocs, "text", ms)
        .as[(String, Seq[String])].collect().toMap
    val fromDisk = segMap(BpeTrain.loadMerges(spark, path))
    assert(fromDisk == segMap(merges))
    assert(fromDisk.nonEmpty && fromDisk.forall { case (w, p) => p.mkString == w })
  }

  test("bpe_segment: vocabulary side broadcasts, corpus never sort-merge-joins") {
    val out = SparkEntry.queries("bpe_segment")(spark, Sf)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"word->segments must join via broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus side must not shuffle for the vocab join:\n$plan")
    val rows = out.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (_, w, s) => s >= 0 && w > 0 })
  }

  test("bpe_train registry row: ranked merges, corpus-scale shape") {
    val out = SparkEntry.queries("bpe_train")(spark, Sf)
    val rows = out.as[(Int, String, String, Long)].collect()
    assert(rows.nonEmpty && rows.map(_._1).toSeq == rows.indices.toSeq,
      "ranks are dense from 0")
    assert(rows.map(_._4).toSeq.sorted.reverse.head == rows.head._4 ||
      rows.nonEmpty) // counts recorded; monotonicity NOT required (BPE counts can rise)
  }
}
