package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for a training-data pipeline: token
  * counting, quality scoring, heuristic language ID, and rolling-hash
  * fingerprinting. Pure codegen'd column expressions (split /
  * regexp_count / higher-order filter+aggregate) — each is one
  * projection over the scan, no shuffle, no UDF.
  *
  * Every formula is reproducible in ANSI SQL (see the DuckDB oracles in
  * Queries): deterministic arithmetic only, no library tokenizers.
  */
object TextFunctions {

  /** Whitespace tokens, lowercased. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  def wsTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Alphanumeric word count. */
  def wordCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+")).cast("long")

  /** BPE-ish pre-tokenizer count: letter runs, single digits, single
    * punctuation (approximates a GPT-2-style pretokenizer's piece
    * count without a vocab). */
  def bpeishCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]")).cast("long")

  def punctCount(text: Column): Column =
    regexp_count(text, lit("[.,;:!?()]")).cast("long")

  /** Stopword hits over an ALREADY-TOKENIZED column. The higher-order
    * `filter` is CodegenFallback (no subexpression elimination), so a
    * caller that needs several counts over the same text must project
    * `tokens(text)` ONCE and pass the materialized array here —
    * re-tokenizing per count re-runs the split per stopword set. */
  def stopHitsIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  private def stopHits(text: Column, words: Seq[String]): Column =
    stopHitsIn(tokens(text), words)

  val EnStop = Seq("the", "of", "and", "to", "in", "is", "a")
  val EsStop = Seq("el", "la", "de", "que", "y", "en", "los")
  val DeStop = Seq("der", "die", "und", "das", "ist", "von", "mit")
  val FrStop = Seq("le", "la", "de", "et", "les", "des", "un")

  def enStopCount(text: Column): Column = stopHits(text, EnStop)

  /** Composite quality score in [0,1] from a pre-tokenized column:
    * length saturation, English stopword density, punctuation penalty.
    * `toks` must be `tokens(text)` projected once by the caller. */
  def qualityScoreFromTokens(toks: Column, text: Column): Column = {
    val n = size(toks).cast("double")
    val stopRatio = stopHitsIn(toks, EnStop).cast("double") / n
    val punctRatio = punctCount(text).cast("double") / length(text).cast("double")
    round(
      least(lit(1.0), n / 50.0) * 0.5 +
        least(lit(1.0), stopRatio * 2.0) * 0.3 +
        greatest(lit(0.0), lit(1.0) - punctRatio * 4.0) * 0.2,
      6)
  }

  /** Single-column convenience form; tokenizes twice (n + stop hits) —
    * prefer [[qualityScoreFromTokens]] in per-row hot paths. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(tokens(text), text)

  /** Stopword-vote language ID over a pre-tokenized column, fixed
    * tie-break priority en > es > de > fr; 'und' when nothing matches.
    * One array materialization, four cheap membership counts. */
  def langIdFromTokens(toks: Column): Column = {
    val en = stopHitsIn(toks, EnStop)
    val es = stopHitsIn(toks, EsStop)
    val de = stopHitsIn(toks, DeStop)
    val fr = stopHitsIn(toks, FrStop)
    when(en === 0 && es === 0 && de === 0 && fr === 0, lit("und"))
      .when(en >= es && en >= de && en >= fr, lit("en"))
      .when(es >= de && es >= fr, lit("es"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Single-column convenience form; re-tokenizes once per stopword set
    * (4×) — prefer [[langIdFromTokens]] in per-row hot paths. */
  def langId(text: Column): Column = langIdFromTokens(tokens(text))

  /** Word n-grams over a pre-tokenized column as space-joined strings
    * — empty array when the document has fewer than n tokens. The
    * string form (not a hash) keeps n-grams joinable across engines,
    * which hash functions are not. */
  def wordNgrams(toks: Column, n: Int): Column =
    // slice+concat_ws per position: higher-order transform runs
    // interpreted (CodegenFallback), so two expression nodes per gram
    // beat n+1 element_at lookups ~3×. Callers doing this over a
    // whole corpus should repartition first — the per-doc cost is
    // real CPU, and a single-file scan serializes it on one task.
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Duplicate n-gram ratio (a Gopher-style repetition signal):
    * 1 - distinct/total over the n-gram multiset; 0 for docs too
    * short to have any. */
  def dupNgramRatio(ngrams: Column): Column =
    when(size(ngrams) === 0, lit(0.0))
      .otherwise(round(
        lit(1.0) - size(array_distinct(ngrams)).cast("double") /
          size(ngrams).cast("double"), 6))

  /** PII patterns kept RE2-compatible (letter classes, bounded
    * repetition, \b) so the same literal string runs under Java regex
    * and DuckDB/RE2 — no engine-specific syntax. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  // country code and parens are OPTIONAL groups: the bare US forms
  // 555-123-4567 and (555) 123-4567 must redact whole, not partially
  // (a mandatory \d{1,2} prefix would eat two area-code digits).
  val PhoneRe = "(\\+?\\d{1,2}[-. ]?)?(\\(\\d{3}\\)|\\d{3})[-. ]?\\d{3}[-. ]?\\d{4}"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** C4-style PII redaction: emails, then phones, then IPs (emails
    * first — they contain digits and dots that the narrower patterns
    * could clip). Three chained codegen'd regexp_replace passes. */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(EmailRe), lit("<EMAIL>")),
        lit(PhoneRe), lit("<PHONE>")),
      lit(IpRe), lit("<IP>"))

  /** Polynomial rolling hash over characters, mod 2^31-1 — a portable
    * document fingerprint (same value from any engine that can fold
    * over codepoints). */
  def fingerprint(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (h, c) => pmod(h * 31 + ascii(c), lit(2147483647L)))

  /** Character shingles (n-grams) as a distinct set. */
  def shingles(textCol: String, n: Int): Column =
    expr(s"array_distinct(transform(sequence(1, greatest(1, length($textCol) - ${n - 1})), i -> substring($textCol, i, $n)))")
}
