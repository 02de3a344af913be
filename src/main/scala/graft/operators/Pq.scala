package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.dotNative

/** Product quantization (the FAISS PQ memory layout): split each
  * d-dim vector into `m` segments, k-means each segment to a `k`-entry
  * codebook, store only the per-segment code ids — `m` small ints per
  * vector instead of `d` doubles, the compression that decides whether
  * a 100-TB embedding index fits a cluster's memory at all (int8
  * quantization is 8×; PQ with m=4,k=16 on d=8 doubles is 32×).
  *
  * Scoring is ADC (asymmetric distance computation): the query stays
  * exact, each segment's dot contribution is precomputed into an m×k
  * LUT — tiny, driver-built, shipped as a LITERAL — so scoring a code
  * row is `Σ_s lut[s][code_s]`: pure per-row arithmetic, zero shuffle,
  * zero join. Training minimizes per-segment L2 (argmin ‖x−c‖² ≡
  * argmax x·c − ‖c‖²/2), the PQ objective — NOT the spherical
  * max-cosine of [[Ivf]], because segments are not unit vectors.
  */
object Pq {

  private def seg(vecCol: Column, s: Int, segLen: Int): Column =
    slice(vecCol, s * segLen + 1, segLen)

  /** Element-wise mean per cell (unnormalized — PQ centroids live in
    * the segment's own scale). */
  private def meanCentroids(df: DataFrame, cellCol: String, vecCol: String): DataFrame =
    df.select(col(cellCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(cellCol), col("pos")).agg(avg("x").as("m"))
      .groupBy(col(cellCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col(cellCol), transform(col("pm"), p => p.getField("m")).as("centroid"))

  /** L2 assignment: every row to its nearest centroid (ties break on
    * the smaller cell id). Same broadcast + max_by shape as
    * [[Ivf.assign]] — one row per vector leaves the aggregate. */
  private def assignL2(df: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String, cellCol: String): DataFrame = {
    val c = cents
      .withColumnRenamed(cellCol, "__cell")
      .withColumn("__cn2", dotNative(col("centroid"), col("centroid")))
    df.drop(cellCol)
      .crossJoin(broadcast(c))
      .withColumn("__score",
        dotNative(col(vecCol), col("centroid")) - col("__cn2") / 2.0)
      .groupBy(idCol)
      .agg(max_by(
        struct(col(vecCol), col("__cell")),
        struct(col("__score"), -col("__cell"))).as("__best"))
      .select(col(idCol),
        col(s"__best.$vecCol").as(vecCol),
        col("__best.__cell").as(cellCol))
  }

  /** Trains one codebook per segment. Returns (seg, code, centroid)
    * with DENSE code ids 0..<cells per segment — array-indexable, which
    * is what lets ADC scoring be a literal lookup. Codebook training
    * iterates Lloyd rounds per segment; the per-segment frames are
    * m narrow slices of one checkpointed pass over the corpus. */
  def train(v: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, rounds: Int): DataFrame = {
    val d = v.select(size(col(vecCol))).first().getInt(0)
    require(d % m == 0, s"dim $d must divide into $m segments")
    val segLen = d / m
    val base = v.localCheckpoint()
    val books = (0 until m).map { s =>
      var part = base.select(col(idCol),
        seg(col(vecCol), s, segLen).as("sv"),
        pmod(xxhash64(col(idCol), lit(s)), lit(k)).cast("int").as("cell"))
      var cents = meanCentroids(part, "cell", "sv")
      for (_ <- 0 until rounds) {
        part = assignL2(part, cents, idCol, "sv", "cell")
        cents = meanCentroids(part, "cell", "sv")
      }
      cents.select(lit(s).as("seg"), col("cell"), col("centroid"))
    }
    val raw = books.reduce(_ unionByName _)
    // densify code ids per segment (empty cells leave holes)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("seg").orderBy("cell")
    raw.withColumn("code", (row_number().over(w) - 1).cast("int"))
      .select("seg", "code", "centroid")
      .localCheckpoint()
  }

  /** Encodes every vector: per segment, the L2-nearest code id →
    * `codes array<int>` ordered by segment. One broadcast of the (m×k)
    * codebook; one aggregate per segment folded into a single
    * groupBy(id) pass. */
  def encode(v: DataFrame, codebooks: DataFrame, idCol: String,
      vecCol: String, m: Int): DataFrame = {
    val d = v.select(size(col(vecCol))).first().getInt(0)
    val segLen = d / m
    val cb = codebooks
      .withColumn("cn2", dotNative(col("centroid"), col("centroid")))
    val exploded = v.select(col(idCol) +: (0 until m).map(s =>
      seg(col(vecCol), s, segLen).as(s"sv$s")): _*)
      .unpivot(Array(col(idCol)),
        (0 until m).map(s => col(s"sv$s")).toArray, "segName", "sv")
      .withColumn("seg", expr("CAST(substring(segName, 3) AS INT)"))
    exploded
      .join(broadcast(cb), "seg")
      .withColumn("__score",
        dotNative(col("sv"), col("centroid")) - col("cn2") / 2.0)
      .groupBy(col(idCol), col("seg"))
      .agg(max_by(col("code"), struct(col("__score"), -col("code"))).as("code"))
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("seg"), col("code")))).as("sc"))
      .select(col(idCol), transform(col("sc"), p => p.getField("code")).as("codes"))
  }

  /** ADC top-k: the query's per-(segment, code) dot contributions are
    * collected into an m×k literal LUT (control-plane metadata, like a
    * partition predicate), so scoring is `Σ_s lut[s][codes[s]]` — a
    * per-row expression over the codes table with NO join and NO
    * shuffle before the final distributed top-k. */
  def adcTopK(spark: SparkSession, codes: DataFrame, codebooks: DataFrame,
      queryVec: Seq[Double], idCol: String, m: Int, k: Int): DataFrame = {
    val d = queryVec.length
    val segLen = d / m
    val lut: Map[(Int, Int), Double] = codebooks
      .collect().map { r =>
        val s = r.getAs[Int]("seg"); val c = r.getAs[Int]("code")
        val cent = r.getSeq[Double](r.fieldIndex("centroid"))
        val q = queryVec.slice(s * segLen, (s + 1) * segLen)
        (s, c) -> q.zip(cent).map { case (a, b) => a * b }.sum
      }.toMap
    val lutLit = array((0 until m).map { s =>
      val row = (0 to lut.keys.filter(_._1 == s).map(_._2).max)
        .map(c => lut.getOrElse((s, c), Double.NegativeInfinity))
      array(row.map(lit): _*)
    }: _*)
    val score = (0 until m)
      .map(s => element_at(element_at(lutLit, s + 1), col("codes")(s) + 1))
      .reduce(_ + _)
    codes.select(col(idCol), round(score, 6).as("adc_score"))
      .orderBy(col("adc_score").desc, col(idCol)).limit(k)
  }
}
