package graft

import org.apache.spark.sql.functions._
import graft.sources.ViewingData

/** SURVEY §4's co-located join claim, demonstrated: two tables
  * bucketed on the join key join with ZERO exchanges — the layout a
  * 100 TB deployment uses for the recurring events⋈weights join. */
class BucketedJoinSpec extends SparkTestBase {

  test("join of co-bucketed tables plans no shuffle exchange") {
    val orders = ViewingData.table(spark, Sf, "orders")
    val lineitem = ViewingData.table(spark, Sf, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum("l_quantity").as("qty"))
      assert(joined.count() > 0)
      val plan = joined.queryExecution.executedPlan.toString
      // tree prints top-down: the aggregation's Exchange sits ABOVE the
      // join; the join's CHILDREN (printed after the join node) must
      // read the bucketed scans directly, with no Exchange.
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      val belowJoin = plan.substring(
        plan.indexOf("MergeJoin").max(plan.indexOf("ShuffledHashJoin")))
      assert(!belowJoin.contains("Exchange"),
        s"join inputs must not shuffle (bucket pruning lost?):\n$plan")
      assert(belowJoin.contains("SelectedBucketsCount") || belowJoin.contains("Bucketed: true"),
        s"scans should be bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
