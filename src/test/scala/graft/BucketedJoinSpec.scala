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

  test("bucketed MERGE target: anti-join never shuffles the target side") {
    // The IncrementalMerge doc claim, demonstrated: at 100 TB the MERGE
    // target is a table bucketed by the merge key, so the anti join
    // reads its buckets in place — only the (much smaller) batch side
    // shuffles, even in the bulk-backfill case where the key set is
    // too big to broadcast.
    val ve = graft.Pipeline.viewingEvents(spark, Sf)
    spark.sql("DROP TABLE IF EXISTS b_merge_target")
    // bucketed by the FULL merge key: a subset (smba_id alone) cannot
    // satisfy the anti join's required distribution over both key
    // columns, and the planner falls back to a shuffled scan
    ve.filter(col("metadata_date") <= "2024-01-20")
      .write.bucketBy(4, "smba_id", "exposure_start_ts")
      .sortBy("smba_id", "exposure_start_ts")
      .saveAsTable("b_merge_target")
    val target = spark.table("b_merge_target")
    val batch = ve.filter(col("metadata_date") > "2024-01-18")
      .withColumn("duration", col("duration") + 1000000L)
      .localCheckpoint()

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = scala.util.Try(
        spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold"))
      .toOption.flatMap(Option(_))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = graft.operators.IncrementalMerge.upsert(
        target, batch, Seq("smba_id", "exposure_start_ts"),
        Seq("event_id"), broadcastKeys = false)
      assert(merged.count() > 0)
      // tree prints top-down: the target is the anti join's FIRST
      // child, so everything between the join line and the target's
      // FileScan line is the target side — it must hold no Exchange,
      // and the scan itself must be bucketed
      val plan = merged.queryExecution.executedPlan.toString
      val joinIdx = plan.indexOf("LeftAnti")
      val scanIdx = plan.indexOf("FileScan parquet spark_catalog.default.b_merge_target")
      assert(joinIdx >= 0, s"expected a non-broadcast anti join:\n$plan")
      assert(scanIdx > joinIdx, s"target scan must feed the anti join:\n$plan")
      assert(!plan.substring(joinIdx, scanIdx).contains("Exchange"),
        s"target side of the anti join must read buckets in place:\n$plan")
      val scanLine = plan.substring(scanIdx, plan.indexOf('\n', scanIdx))
      assert(scanLine.contains("Bucketed: true"),
        s"target must be read as a bucketed scan:\n$scanLine")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevAqe match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
