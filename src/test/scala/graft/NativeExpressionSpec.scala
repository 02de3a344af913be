package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.plans.GraftExtensions
import graft.sources.ViewingData

class NativeExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("vec_dot is bitwise-identical to the higher-order dot on real embeddings") {
    GraftExtensions.register(spark)
    val v = ViewingData.table(spark, Sf, "embeddings")
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("e"))
    val q = v.limit(1).select(col("e").as("qe"))
    val both = v.crossJoin(broadcast(q)).select(
      VectorFunctions.dot(col("e"), col("qe")).as("hof"),
      VectorFunctions.dotNative(col("e"), col("qe")).as("native"))
    val diffs = both.filter(col("hof") =!= col("native")).count()
    assert(diffs == 0, "summation order must match the HOF left fold exactly")
  }

  test("vec_dot participates in WholeStageCodegen over a parquet scan") {
    GraftExtensions.register(spark)
    // Inputs must be plain array<double> attributes: a transform-lambda
    // cast in the same projection is CodegenFallback and would push the
    // whole stage to interpreted eval (the pair-join queries pre-cast
    // in an earlier projection for exactly this reason).
    val tmp = java.nio.file.Files.createTempDirectory("vecdot").toString + "/t"
    ViewingData.table(spark, Sf, "embeddings")
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("e"))
      .write.parquet(tmp)
    val df = spark.read.parquet(tmp)
      .select(VectorFunctions.dotNative(col("e"), col("e")).as("d"))
    assert(df.count() > 0)
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("vec_dot")),
      s"expected vec_dot inside a codegen stage in:\n$plan")
  }

  test("RewriteDotProduct turns the declarative HOF fold into vec_dot") {
    GraftExtensions.register(spark)
    val tmp = java.nio.file.Files.createTempDirectory("vecdot_rw").toString + "/t"
    ViewingData.table(spark, Sf, "embeddings")
      .select(col("vec_id"), VectorFunctions.toDouble(col("embedding")).as("e"))
      .write.parquet(tmp)
    val hof = spark.read.parquet(tmp)
      .select(col("vec_id"), VectorFunctions.dot(col("e"), col("e")).as("d"))
    val plan = hof.queryExecution.executedPlan.toString
    assert(plan.contains("vec_dot"),
      s"optimizer should rewrite aggregate(zip_with(...)) to vec_dot:\n$plan")
    // and it must still compute the same values as the unrewritten form
    val expected = spark.read.parquet(tmp)
      .select(col("vec_id"), VectorFunctions.dotNative(col("e"), col("e")).as("d"))
    assert(hof.collect().map(_.getDouble(1)).sum ==
      expected.collect().map(_.getDouble(1)).sum)
  }

  test("registration is idempotent and works via SQL too") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].collect().head == 11.0)
  }
}
