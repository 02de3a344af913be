package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Train-then-serve for a text quality model, the way a production
  * corpus filter actually runs (the fastText / CCNet loop): hashed
  * bag-of-words features (hashing trick — fixed width, no vocabulary,
  * collisions are the accepted noise), a logistic model fit on a
  * LABELED SAMPLE, and inference shipped back to the cluster as a
  * broadcast LITERAL weight table evaluated at scan speed.
  *
  * Division of labor at 100 TB:
  *  - featurization of the training sample is distributed (one
  *    explode + one (doc, bucket) count aggregate over a capped,
  *    deterministically-hash-sampled subset);
  *  - the FIT is driver-side full-batch gradient descent on the
  *    collected sparse features — the sample is control-plane-sized
  *    by construction (trainCap docs × ≤dims buckets), and a linear
  *    model on a bounded sample is a scalar loop, not a cluster job
  *    (MLlib would distribute the same gradient; unnecessary below
  *    millions of examples);
  *  - INFERENCE never sees the model as data: weights become a
  *    literal array in the plan, scoring is
  *    σ(bias + Σ_tok w[bucket(tok)] / n) — one expression, zero
  *    shuffle, zero join, embarrassingly parallel over any corpus.
  *
  * Everything is deterministic: the sample is an md5-threshold cut,
  * the collected features are sorted before the fit, and GD runs a
  * fixed iteration count — retraining on the same data reproduces
  * the same weights bit-for-bit (spec-pinned).
  */
object HashedLinearModel {

  /** Fitted model: `weights(b)` is the coefficient of hashed bucket
    * b; score input is L1-normalized token counts. */
  final case class Model(weights: Array[Double], bias: Double, dims: Int)

  /** Feature bucket of one token — xxhash64 mod dims, the same
    * hashing-trick bucket everywhere (train and serve must agree). */
  def bucket(tok: Column, dims: Int): Column =
    pmod(xxhash64(tok), lit(dims)).cast("int")

  /** Fits a binary logistic model on `docs(labelCol)` ∈ {0, 1} (cast
    * from boolean upstream). Featurization is distributed; the fit
    * collects at most ~`trainCap` docs' sparse features
    * (deterministic hash-threshold sample, the [[Pq.train]] shape).
    * The cap is what makes the train cost CONSTANT in corpus size —
    * a linear model saturates far below 8k examples for 512 hashed
    * dims (the ×10 sweep showed the uncapped fit growing linearly
    * with the corpus for zero accuracy gain); raise it only with
    * dims. */
  def train(docs: DataFrame, idCol: String, textCol: String,
      labelCol: String, dims: Int = 512, iters: Int = 1500,
      lr: Double = 30.0, trainCap: Long = 8192L): Model = {
    val base = docs.select(col(idCol).cast("long").as("__id"),
      col(labelCol).cast("double").as("__y"),
      TextFunctions.tokens(col(textCol)).as("__toks"))
    val n = base.count()
    val sampled = if (n <= trainCap) base else {
      val den = 1000000L
      base.filter(pmod(xxhash64(col("__id")), lit(den)) <
        lit(trainCap * den / n))
    }
    // one (doc, bucket) count aggregate; per-doc token totals ride
    // along via a window-free second aggregate on the driver
    val rows = sampled
      .select(col("__id"), col("__y"), explode(col("__toks")).as("__t"))
      .groupBy(col("__id"), col("__y"), bucket(col("__t"), dims).as("__b"))
      .count()
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2), r.getLong(3)))
      .sortBy(t => (t._1, t._3)) // collect order is nondeterministic; the fit must not be
    // CSR layout over the sorted rows (docs in id order, features in
    // bucket order within each doc — exactly the old boxed byDoc
    // grouping's iteration order, so every FP accumulation below runs
    // in the SAME order and the fitted weights stay bit-identical).
    // Primitive arrays instead of Array[(Int, Double)] per doc: the
    // 1500-iteration full-batch loop is the row's driver-side hot
    // path, and the boxed form spent most of it in tuple allocation
    // and pointer chasing (guide §1.2 step 2 — per-task work).
    val nnz = rows.length
    val fIdx = new Array[Int](nnz)
    val fVal = new Array[Double](nnz)
    val offB = scala.collection.mutable.ArrayBuilder.make[Int]
    val yB = scala.collection.mutable.ArrayBuilder.make[Double]
    var p = 0
    while (p < nnz) {
      val docId = rows(p)._1
      offB += p
      yB += rows(p)._2
      var tot = 0L
      var q = p
      while (q < nnz && rows(q)._1 == docId) { tot += rows(q)._4; q += 1 }
      val totD = tot.toDouble
      while (p < q) {
        fIdx(p) = rows(p)._3
        fVal(p) = rows(p)._4 / totD
        p += 1
      }
    }
    offB += nnz
    val off = offB.result()
    val ys = yB.result()
    val nDocs = ys.length
    val w = new Array[Double](dims)
    var b = 0.0
    val m = nDocs.toDouble
    var it = 0
    while (it < iters) {
      var gb = 0.0
      val gw = new Array[Double](dims)
      var d = 0
      while (d < nDocs) {
        var z = b
        var k = off(d)
        val end = off(d + 1)
        while (k < end) { z += w(fIdx(k)) * fVal(k); k += 1 }
        val err = ys(d) - 1.0 / (1.0 + math.exp(-z))
        gb += err
        k = off(d)
        while (k < end) { gw(fIdx(k)) += err * fVal(k); k += 1 }
        d += 1
      }
      b += lr * gb / m
      var j = 0
      while (j < dims) { w(j) += lr * gw(j) / m; j += 1 }
      it += 1
    }
    Model(w, b, dims)
  }

  /** Persists a trained model as a one-row parquet artifact — the
    * classifier analogue of [[BpeTrain.saveMerges]]: train once per
    * model release, score everywhere. Control-plane-sized (the weight
    * vector is `dims` doubles). */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    Seq((model.weights.toSeq, model.bias, model.dims))
      .toDF("weights", "bias", "dims")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Loads a [[save]] artifact. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val r = spark.read.parquet(path).select("weights", "bias", "dims").head
    Model(r.getSeq[Double](0).toArray, r.getDouble(1), r.getInt(2))
  }

  /** σ(bias + Σ w[bucket(tok)] / n) over `textCol` — the weights are
    * LITERALS in the plan (control-plane metadata, like a partition
    * predicate), so this column is a pure scan-speed projection. */
  def scoreCol(textCol: Column, model: Model): Column = {
    val toks = TextFunctions.tokens(textCol)
    val wLit = typedlit(model.weights.toSeq)
    val z = lit(model.bias) +
      aggregate(toks, lit(0.0), (acc, t) =>
        acc + element_at(wLit, bucket(t, model.dims) + 1)) /
        greatest(size(toks), lit(1))
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
