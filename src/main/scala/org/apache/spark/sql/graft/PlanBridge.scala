package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge into `Dataset.ofRows` (private[sql]) so graft can wrap its
  * own [[LogicalPlan]] nodes as DataFrames — the standard shim every
  * Spark extension library ships (a one-file package-private hop, not
  * an internals fork). Spark 4 moved the implementation classes to
  * `org.apache.spark.sql.classic`; the cast is safe because a local
  * or cluster session IS a classic session (connect sessions don't
  * reach this code path — graft plans are driver-side constructs).
  */
object PlanBridge {
  def dataFrame(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
