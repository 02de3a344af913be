package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** BPE (byte-pair-encoding) merge induction over a corpus — the
  * vocabulary-training half of the tokenizer loop (Sennrich et al.
  * 2016), distributed the way the algorithm's structure demands:
  *
  *  - The corpus is read ONCE, into a (word, count) vocabulary —
  *    |vocab| ≪ |corpus| is the whole trick: 100 TB of text folds to
  *    a vocabulary of at most a few million rows in one
  *    explode+groupBy shuffle, and every later round touches only
  *    that.
  *  - Each merge round is ONE narrow aggregate over the vocabulary
  *    (adjacent-pair counts weighted by word frequency, map-side
  *    combined) plus a driver-side argmax — the winning pair is
  *    control-plane metadata, like a centroid sync in [[Pq]]'s Lloyd
  *    rounds. The merge applies as a pure column expression (a
  *    left-to-right greedy fold over each word's symbol array), so
  *    no round re-reads or reshuffles anything but the vocab.
  *  - Ties break lexicographically (then-smaller pair wins), making
  *    training DETERMINISTIC across partitionings and retries — the
  *    same property every other operator here buys with seeded
  *    hashes.
  *
  * Segmenting a corpus with the learned merges inverts the same
  * economics: segment the VOCABULARY (tiny) and broadcast-join words
  * to their segmentation — the 100-TB scan never evaluates the merge
  * fold itself.
  */
object BpeTrain {

  /** One learned merge: `rank` = order learned, `left`+`right` →
    * concatenated symbol, `pair_count` = weighted frequency at the
    * time of the merge. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Greedy left-to-right application of one merge to a symbol
    * array — the BPE apply rule ("aaa" + (a,a) → ["aa","a"]). */
  private[operators] def applyMerge(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      array().cast("array<string>"),
      (acc, s) => when(
        size(acc) > 0 && element_at(acc, -1) === a && s === b,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(s))))

  private def chars(w: Column): Column =
    // sequence(1, 0) yields [1, 0] (descending step default), so an
    // empty word must short-circuit to an empty symbol array instead
    // of two phantom "" symbols that could learn a bogus ("","") merge
    when(length(w) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(w)), i => substring_dyn(w, i)))

  private def substring_dyn(w: Column, i: Column): Column =
    call_function("substring", w, i, lit(1))

  /** The (word, count, symbols) working vocabulary — one corpus
    * shuffle, then `localCheckpoint` so the merge rounds iterate a
    * materialized frame instead of re-deriving the corpus scan. */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("w"), col("cnt"), chars(col("w")).as("syms"))
      .localCheckpoint()

  /** Learns up to `nMerges` merges. Stops early when no adjacent
    * pair remains (fully merged vocabulary). */
  def train(docs: DataFrame, textCol: String, nMerges: Int): Seq[Merge] =
    trainAndSegment(docs, textCol, nMerges)._1

  /** [[train]] that ALSO returns the final vocabulary's segmentation
    * (word, segments) — after the last merge round the working vocab
    * holds exactly each word's segmented form, so callers that want
    * both (the train-then-apply registry shape) pay ONE corpus scan
    * and one merge fold instead of re-deriving the vocabulary and
    * replaying every merge through [[segmentVocabulary]] (which
    * remains the tool for applying SAVED merges to a NEW corpus). */
  def trainAndSegment(docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    var vocab = vocabulary(docs, textCol)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var done = false
    var round = 0
    while (round < nMerges && !done) {
      val top = vocab
        .select(col("cnt"), explode(zip_with(
          // greatest(..., 0): empty symbol arrays (empty-string words)
          // have no adjacent pairs; a raw size-1 would be -1
          slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
          slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0))),
          (x, y) => struct(x.as("l"), y.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .head(1)
      if (top.isEmpty) done = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val c = top(0).getLong(2)
        merges += Merge(round, l, r, c)
        vocab = vocab.withColumn("syms", applyMerge(col("syms"), l, r))
        // the fold deepens lineage linearly; rematerialize every few
        // rounds so round k's plan never replays rounds 1..k-1
        if ((round + 1) % 4 == 0) vocab = vocab.localCheckpoint()
        round += 1
      }
    }
    (merges.toSeq, vocab.select(col("w"), col("syms").as("segments")))
  }

  /** Persists learned merges as a tiny rank-ordered parquet table —
    * the tokenizer ARTIFACT: train once, segment everywhere. The
    * merge list is control-plane-sized (its row count is the merge
    * budget), so save/load are driver-side concerns; ORDER is the
    * semantics, hence the explicit rank column and the sorted read. */
  def saveMerges(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], path: String): Unit = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "left", "right", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Loads a [[saveMerges]] artifact, rank order restored. */
  def loadMerges(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Merge] =
    spark.read.parquet(path)
      .select("rank", "left", "right", "pair_count").collect()
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_.rank).toSeq

  /** Segmentation of `textCol`'s words under learned merges, as a
    * per-word broadcast join: the merge fold runs over the DISTINCT
    * words only; the corpus scan joins words to finished segment
    * arrays. Returns (word, segments) for the corpus vocabulary —
    * join it to any exploded token stream. */
  def segmentVocabulary(docs: DataFrame, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val start = docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .distinct()
      .select(col("w"), chars(col("w")).as("segments"))
    merges.zipWithIndex.foldLeft(start) { case (df, (m, i)) =>
      val next = df.withColumn("segments", applyMerge(col("segments"), m.left, m.right))
      if ((i + 1) % 4 == 0) next.localCheckpoint() else next
    }
  }
}
