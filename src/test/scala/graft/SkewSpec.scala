package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedSum equals plain groupBy sum") {
    val df = ViewingFixtures.skewed(spark)
    val plain = df.groupBy("k").agg(sum("v").as("total"), sum(lit(1L)).as("cnt"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedSum(df, Seq("k"), "id", buckets = 8,
      Map("total" -> col("v"), "cnt" -> lit(1L)))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedSum phase-1 grouping includes the salt (key split across reducers)") {
    val df = ViewingFixtures.skewed(spark)
    val partialGroups = df
      .withColumn("__salt", Skew.saltFrom(col("id"), 8))
      .groupBy("k", "__salt").count()
      .filter(col("k") === "hot")
      .count()
    assert(partialGroups > 1, "hot key must split over multiple salt buckets")
  }

  test("saltedJoin equals plain join") {
    val fact = ViewingFixtures.skewed(spark)
    val dim = Seq(("hot", 10L), ("cold1", 20L), ("cold2", 30L)).toDF("k", "w")
    val plain = fact.join(dim, "k").agg(sum(col("v") * col("w"))).as[Long].head()
    val joined = Skew.saltedJoin(fact, dim, "k", "id", buckets = 4)
    val salted = joined.agg(sum(col("v") * col("w"))).as[Long].head()
    assert(salted == plain)
    // the mitigation is only real if the fact side SHUFFLES on the
    // salted key — a broadcast join would make the salt a no-op
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"), s"salted join must shuffle:\n$plan")
    assert(plan.contains("__salt"), s"join keys must include the salt:\n$plan")
  }
}

object ViewingFixtures {
  def skewed(spark: org.apache.spark.sql.SparkSession) = {
    import spark.implicits._
    val rows = (1L to 1000L).map(i =>
      (i, if (i <= 900) "hot" else if (i % 2 == 0) "cold1" else "cold2", i % 7))
    rows.toDF("id", "k", "v").repartition(8)
  }
}
