package graft

import org.apache.spark.sql.functions._

import graft.operators.HashedLinearModel

/** The train-then-serve loop of [[operators.HashedLinearModel]]:
  * the labeling function (text_quality_model's exact-integer gate)
  * is LINEAR in token counts, so a logistic fit over hashed
  * bag-of-words must recover it from examples — held-out accuracy is
  * the end-to-end proof the distributed featurization, the
  * driver-side fit, and the literal-weight inference all line up.
  */
class HashedLinearModelSpec extends SparkTestBase {
  import spark.implicits._

  private def labeled = {
    val lab = SparkEntry.queries("text_quality_model")(spark, Sf)
      .select(col("doc_id").as("l_id"), (col("verdict") === "keep").as("label"))
    graft.sources.ViewingData.table(spark, Sf, "documents")
      .join(lab, col("doc_id") === col("l_id"))
      .select("doc_id", "text", "label")
  }

  test("held-out accuracy >= 0.9 recovering the linear gate from examples") {
    val docs = labeled.localCheckpoint()
    val model = HashedLinearModel.train(
      docs.filter(col("doc_id") % 4 =!= 0), "doc_id", "text", "label")
    val test = docs.filter(col("doc_id") % 4 === 0)
      .select(col("label"),
        (HashedLinearModel.scoreCol(col("text"), model) > 0.5).as("pred"))
      .select((col("label") === col("pred")).cast("int").as("hit"))
      .agg(avg("hit"), count(lit(1))).head()
    val (acc, n) = (test.getDouble(0), test.getLong(1))
    assert(n > 50, s"held-out set too small: $n")
    assert(acc >= 0.9, s"held-out accuracy $acc on $n docs")
  }

  test("retraining on the same data reproduces the same weights bit-for-bit") {
    val train = labeled.filter(col("doc_id") % 4 =!= 0).localCheckpoint()
    val a = HashedLinearModel.train(train, "doc_id", "text", "label")
    val b = HashedLinearModel.train(train, "doc_id", "text", "label")
    assert(a.bias == b.bias && a.weights.sameElements(b.weights),
      "deterministic sample + sorted features + fixed GD must reproduce the fit")
  }

  test("eval matrix: per-reason rows, counts consistent, agreement well-formed") {
    val rows = SparkEntry.queries("text_quality_model_eval")(spark, Sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val reasons = rows.map(_._1).toSet
    assert(reasons.contains("gate_keep"), s"got $reasons")
    rows.foreach { case (reason, n, keep, agree) =>
      assert(n > 0 && keep >= 0 && keep <= n, s"$reason counts")
      assert(agree >= 0.0 && agree <= 1.0, s"$reason agree_rate $agree")
      // agreement definition: for gate_keep rows it's the model-keep
      // rate; for drop reasons it's the model-drop rate
      val expect = if (reason == "gate_keep") keep.toDouble / n else (n - keep).toDouble / n
      assert(math.abs(agree - expect) < 1e-3, s"$reason: $agree vs $expect")
    }
  }

  test("inference is a shuffle-free projection; registry row emits both verdicts") {
    val out = SparkEntry.queries("text_quality_model_trained")(spark, Sf)
    val plan = out.queryExecution.executedPlan.toString
    // the SERVING side of the plan adds no exchange beyond what the
    // one-off training job needed: score the scan directly
    val docs = graft.sources.ViewingData.table(spark, Sf, "documents")
    val model = HashedLinearModel.train(labeled, "doc_id", "text", "label")
    val servePlan = docs.select(
        HashedLinearModel.scoreCol(col("text"), model).as("p"))
      .queryExecution.executedPlan.toString
    assert(!servePlan.contains("Exchange"),
      s"literal-weight inference must not shuffle:\n$servePlan")
    val verdicts = out.select("verdict").distinct().as[String].collect().toSet
    assert(verdicts == Set("keep", "drop"), s"got $verdicts")
    assert(plan.nonEmpty)
  }

  test("save/load round-trips the model artifact bit-for-bit") {
    // the persisted-tokenizer discipline applied to the classifier:
    // text_quality_model_eval scores a loaded artifact, so the
    // round-trip must preserve weights/bias/dims exactly (training is
    // deterministic, so loaded == retrained too)
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.ViewingData.table(spark, Sf, "documents")
      .select(col("doc_id"), col("text"),
        (col("doc_id") % 2 === 0).as("keep"))
    val m = HashedLinearModel.train(docs, "doc_id", "text", "keep")
    val path = java.nio.file.Files.createTempDirectory("qmodel").toString + "/m"
    HashedLinearModel.save(spark, m, path)
    val loaded = HashedLinearModel.load(spark, path)
    assert(loaded.bias == m.bias && loaded.dims == m.dims)
    assert(java.util.Arrays.equals(loaded.weights, m.weights),
      "weight vector must round-trip exactly")
  }
}
