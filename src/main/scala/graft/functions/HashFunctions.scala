package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash+LSH and SimHash near-duplicate detection.
  *
  * Both are expressed as codegen'd column expressions over a shingle /
  * token array plus one explode+self-join on bucket keys — the standard
  * scale shape: candidate generation is bucket-local (band hash or
  * 16-bit chunk), so the join never compares documents across buckets.
  * Band/bucket keys hash-distribute evenly by construction, which makes
  * the shuffle skew-resistant at 100 TB.
  */
object HashFunctions {

  /** MinHash signature: for each of `k` seeded xxhash64 functions, the
    * minimum hash over the shingle set.
    *
    * Per-row closed form (interpreted higher-order eval — fine for a
    * handful of rows; for bulk signatures use [[minhashSignatures]]). */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    transform(
      sequence(lit(0), lit(k - 1)),
      s => aggregate(
        shingleCol,
        lit(Long.MaxValue),
        (m, g) => least(m, xxhash64(g, s))))

  /** Bulk MinHash: explode shingles and compute the k minima as k
    * codegen'd MIN aggregates in ONE hash aggregation — map-side
    * partial min makes the shuffle |docs|-sized regardless of shingle
    * count, and every xxhash64 runs inside WholeStageCodegen (the
    * per-row higher-order form evaluates interpreted, ~100× slower).
    * Input df: (idCol, shinglesCol); output: (idCol, sig array<long>). */
  def minhashSignatures(df: DataFrame, idCol: String, shinglesCol: String, k: Int): DataFrame = {
    val mins = (0 until k).map(s => min(xxhash64(col("gram"), lit(s))).as(s"h$s"))
    df.select(col(idCol), explode(col(shinglesCol)).as("gram"))
      .groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** Bulk MinHash straight from a text column: explode shingle
    * POSITIONS and substring per row instead of materializing a
    * shingle array first — min() is duplicate-insensitive, so skipping
    * the (interpreted, per-row) transform+array_distinct changes
    * nothing about the signature while keeping the whole pipeline in
    * WholeStageCodegen. Identical output to [[minhashSignatures]] over
    * [[TextFunctions.shingles]] of the same text (spec-asserted). */
  def minhashSignaturesText(
      df: DataFrame, idCol: String, textCol: String, n: Int, k: Int): DataFrame = {
    val mins = (0 until k).map(s => min(xxhash64(col("gram"), lit(s))).as(s"h$s"))
    df.select(col(idCol),
        explode(sequence(lit(1), greatest(lit(1), length(col(textCol)) - (n - 1)))).as("pos"),
        col(textCol))
      .select(col(idCol),
        call_function("substring", col(textCol), col("pos"), lit(n)).as("gram"))
      .groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** 16-bit md5 rate-gate threshold as 4 lowercase hex chars, clamped
    * to [1, 65535] slice units — the ONE clamp for every fixed-N
    * calibration gate (F35's ppl pool, D21's query sample): never
    * "0000" (floor(rate·2^16) of a huge pool would mint an EMPTY
    * sample that both engines agree on — the r12 review class), and
    * rate 1.0 caps at 0xffff (keeps 65535/65536, a one-key-value
    * bias identical in both engines). Oracles restate the same
    * arithmetic in SQL. */
  def rateGateHex(rate: Double): String =
    f"${math.min(65535L, math.max(1L, math.floor(rate * 65536.0).toLong))}%04x"

  /** Signature-estimate Jaccard: matching components / k, rounded to
    * 6 dp — the one verification expression shared by dedup_minhash
    * and the incremental MinhashDelta probe (a drift here would
    * desynchronize their thresholds silently). */
  def signatureEstimate(a: Column, b: Column, k: Int): Column =
    round(
      size(filter(zip_with(a, b, (x, y) =>
        when(x === y, lit(1)).otherwise(lit(0))), v => v === 1)).cast("double") /
        k.toDouble,
      6)

  /** MinHash over md5 HEX STRINGS instead of seeded xxhash64 — the
    * oracle flavor. md5 is the one hash Spark and DuckDB compute
    * identically (lowercase hex, same bytes), and lexicographic min
    * over fixed-width lowercase hex is the same total order in both
    * engines, so a signature built this way is reproducible in ANSI
    * SQL and the WHOLE LSH pipeline (shingle → min-hash → band →
    * candidate join → estimate threshold) gets a full DuckDB oracle.
    * Production dedup stays on [[minhashSignaturesText]]: a codegen'd
    * long min beats 32-char string mins at 100 TB — this flavor exists
    * to prove the pipeline's arithmetic, not to run the corpus.
    * Seeds are appended textually (`gram || ':' || seed`), matching
    * the oracle's `g || ':' || s`. Same explode-positions shape as
    * [[minhashSignaturesText]]; output: (idCol, sig array<string>). */
  def md5MinhashSignaturesText(
      df: DataFrame, idCol: String, textCol: String, n: Int, k: Int): DataFrame = {
    val mins = (0 until k).map(s =>
      min(md5(concat(col("gram"), lit(":" + s)))).as(s"h$s"))
    df.select(col(idCol),
        explode(sequence(lit(1), greatest(lit(1), length(col(textCol)) - (n - 1)))).as("pos"),
        col(textCol))
      .select(col(idCol),
        call_function("substring", col(textCol), col("pos"), lit(n)).as("gram"))
      .groupBy(idCol)
      .agg(mins.head, mins.tail: _*)
      .select(col(idCol), array((0 until k).map(s => col(s"h$s")): _*).as("sig"))
  }

  /** [[lshBands]] for md5-string signatures: band hash = md5 of the
    * '|'-joined band slice — `md5(string_agg(h,'|' ORDER BY seed))`
    * per `seed // rowsPerBand` group in the oracle. */
  def md5Bands(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_id"),
        md5(concat_ws("|", slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand))))
          .as("band_hash")))

  /** Explode a signature into (band_id, band_hash) LSH keys;
    * `bands × rowsPerBand` must equal the signature length. */
  def lshBands(sigCol: Column, bands: Int, rowsPerBand: Int): Column =
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band_id"),
        xxhash64(slice(sigCol, b * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash")))

  /** Bulk SimHash: explode tokens, hash each ONCE, then aggregate
    * per-bit one-counts packed FOUR counters per long in 16-bit lanes —
    * 16 sum aggregates + a count instead of 64 conditional sums. The
    * narrower aggregate keeps the generated HashAggregate small (the
    * 64-buffer form compiles to a near-method-limit janino blob that
    * dominated cold runtime). Lanes never carry into each other while
    * a document has < 65536 tokens — ENFORCED by pre-truncating the
    * token array to 65535 entries (a 65535-token prefix signature is a
    * deterministic, documented approximation for mega-token documents;
    * a silent lane carry would corrupt all 64 bits). The sign vote
    * 2*ones > n is exactly the ±1-sum > 0 of the per-row closed form
    * [[simhash]].
    * Input df: (idCol, tokensCol); output: (idCol, simhash long). */
  def simhashes(df: DataFrame, idCol: String, tokensCol: String): DataFrame =
    simhashesCapped(df, idCol, tokensCol, SimhashTokenCap)

  /** The shared truncation bound: both simhash forms cap the token
    * array here, so they stay bit-identical by construction at ANY
    * document length. 65535 is the largest cap the bulk form's 16-bit
    * lane-packed sums admit without carry. */
  private[graft] val SimhashTokenCap = 65535

  /** Cap-parameterized bulk form — the spec instantiates a tiny cap to
    * prove both forms truncate identically without building 65k-token
    * rows. */
  private[graft] def simhashesCapped(
      df: DataFrame, idCol: String, tokensCol: String, cap: Int): DataFrame =
    simhashesWith(df, idCol, tokensCol, cap, t => xxhash64(t))

  /** The lane-packed bulk aggregation with a pluggable 64-bit token
    * hash — one body serves the production xxhash64 form and the
    * md5-derived oracle twin ([[simhashesMd5]]). */
  private def simhashesWith(df: DataFrame, idCol: String, tokensCol: String,
      cap: Int, tokenHash: Column => Column): DataFrame = {
    val packs = (0 until 16).map { g =>
      val lanes = (0 until 4).map { l =>
        call_function("shiftleft",
          shiftright_dyn(col("th"), lit(g * 4 + l)).bitwiseAND(1L), lit(16 * l))
      }
      sum(lanes.reduce(_ bitwiseOR _)).as(s"p$g")
    }
    val packed = (0 until 64).map { i =>
      val (g, l) = (i / 4, i % 4)
      val ones = call_function("shiftrightunsigned", col(s"p$g"), lit(16 * l))
        .bitwiseAND(0xffffL)
      when(ones * 2 > col("n"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    df.select(col(idCol), explode(slice(col(tokensCol), 1, cap)).as("tok"))
      .select(col(idCol), tokenHash(col("tok")).as("th"))
      .groupBy(idCol)
      .agg(packs.head, packs.tail :+ count(lit(1)).as("n"): _*)
      .select(col(idCol), packed.as("simhash"))
  }

  /** 64-bit token hash from md5: the first 16 hex chars parsed
    * big-endian (two conv calls — bit i of the result is nibble-bit
    * (i mod 4) of hex char (16 − i div 4), the arithmetic a SQL
    * oracle reproduces with strpos/shifts). Salted so it is
    * independent of every other md5 use in the registry. */
  private[graft] def md5Hash64(t: Column): Column = {
    val h = md5(concat(lit("graft-sh:"), t).cast("binary"))
    val hi = conv(substring(h, 1, 8), 16, 10).cast("long")
    val lo = conv(substring(h, 9, 8), 16, 10).cast("long")
    call_function("shiftleft", hi, lit(32)).bitwiseOR(lo)
  }

  /** [[simhashes]] with the bit source swapped from xxhash64 to md5
    * (the D9/E2b oracle discipline applied to SimHash): same lane-
    * packed aggregation, same sign rule, same [[simhashChunks]] /
    * [[hammingDistance]] downstream — but every bit is reproducible
    * by DuckDB hex arithmetic, so the whole pipeline hash-matches a
    * SQL oracle. Production keeps xxhash64 (one hash call, no digest
    * or string ops); this twin pins the arithmetic. */
  def simhashesMd5(df: DataFrame, idCol: String, tokensCol: String): DataFrame =
    simhashesWith(df, idCol, tokensCol, SimhashTokenCap, md5Hash64)

  /** 64-bit SimHash over a token array: per-bit ±1 votes weighted by
    * token occurrences, sign-thresholded, packed to a long.
    * Per-row closed form — for bulk use [[simhashes]]. Applies the
    * same [[SimhashTokenCap]] as the bulk form (its lane-packed sums
    * would overflow past that), so the two code paths stay
    * bit-identical by construction at ANY document length
    * (FunctionsSpec pins the equivalence). */
  def simhash(tokensCol: Column): Column =
    simhashCapped(tokensCol, SimhashTokenCap)

  private[graft] def simhashCapped(tokensCol: Column, cap: Int): Column = {
    val votes = aggregate(
      slice(tokensCol, 1, cap),
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(
        acc,
        sequence(lit(0), lit(63)),
        (a, i) => a + when(expr_bit(t, i) === 1, 1L).otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc.bitwiseOR(x)) // OR-pack: bit 63 would overflow '+'
  }

  /** Bit `i` of xxhash64(token). */
  private def expr_bit(t: Column, i: Column): Column =
    pmod(shiftright_dyn(xxhash64(t), i), lit(2))

  /** shiftright with a column shift amount (the Scala DSL only takes a
    * literal; the SQL expression accepts any expression). */
  private def shiftright_dyn(v: Column, n: Column): Column =
    call_function("shiftright", v, n)

  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Equal-width chunks of a SimHash — the LSH recall knob: two docs
    * within hamming distance d share at least one of `nChunks` chunks
    * whenever d < nChunks (pigeonhole), so more/narrower chunks widen
    * the GUARANTEED candidate band (4×16-bit → d≤3, 8×8-bit → d≤7) at
    * the cost of more bucket collisions per chunk (each chunk key
    * carries fewer bits). The shuffle stays |docs|×nChunks rows either
    * way — recall is bought with join selectivity, not extra passes.
    * FunctionsSpec pins the guarantee and a 4-chunk miss that 8 chunks
    * must catch. */
  def simhashChunks(simCol: Column, nChunks: Int = 4): Column = {
    require(nChunks >= 2 && 64 % nChunks == 0,
      s"nChunks must divide 64 (and be ≥2): $nChunks")
    val width = 64 / nChunks
    transform(
      sequence(lit(0), lit(nChunks - 1)),
      c => struct(
        c.as("chunk_id"),
        pmod(shiftright_dyn(simCol, c * width), lit(1L << width)).as("chunk")))
  }

  /** Candidate pairs sharing an LSH key. `payload` columns ride along
    * through the explode and surface as `<c>_a` / `<c>_b`, so the
    * verification score is computed INSIDE the bucket join — joining
    * the pair list back to the signature table would re-instantiate
    * the whole signature aggregation per join (Catalyst reuses
    * exchanges only for identical subtrees, which a pairs⋈signatures
    * join is not). A pair sharing several keys appears once per key;
    * callers score+filter, then `.distinct()` — scoring before the
    * dedup is cheap because candidates are bucket-local and few. */
  def bucketedPairs(
      df: DataFrame,
      idCol: String,
      keysCol: String,
      payload: Seq[String] = Nil): DataFrame = {
    val exploded = df
      .select(col(idCol) +: explode(col(keysCol)).as("lsh_key") +: payload.map(col): _*)
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, expr(s"a.lsh_key = b.lsh_key AND a.$idCol < b.$idCol"))
      .select(col(s"a.$idCol").as("id_a") +: col(s"b.$idCol").as("id_b") +:
        payload.flatMap(c => Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b"))): _*)
  }
}
