package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at cluster scale.
  *
  * AQE's skew-join splitting handles most cases at runtime; these are
  * the explicit forms for the two shapes AQE can't fix:
  *
  *  - a grouped aggregation where one key holds a large share of all
  *    rows (AQE cannot split a hash-aggregate group): two-phase salted
  *    aggregation — partial-aggregate on (key, salt), then merge.
  *  - a join against a dimension where a handful of fact keys are hot:
  *    replicate the dim row `saltBuckets` times and salt the fact side
  *    randomly-but-deterministically, so one hot key spreads over
  *    `saltBuckets` reducers.
  */
object Skew {

  /** Deterministic pseudo-random salt in [0, buckets) derived from a
    * unique column — reproducible across retries (no rand()), which
    * matters for exactly-once sinks. */
  def saltFrom(unique: Column, buckets: Int): Column =
    pmod(xxhash64(unique), lit(buckets)).cast("int")

  /** Two-phase SUM/COUNT aggregation over salted keys. `aggs` maps
    * output name -> column to sum. Phase 1 shuffles (keys, salt) —
    * splitting each hot key `buckets` ways — phase 2 merges the tiny
    * partial frame. */
  def saltedSum(
      df: DataFrame,
      keys: Seq[String],
      uniqueCol: String,
      buckets: Int,
      aggs: Map[String, Column]): DataFrame = {
    val salted = df.withColumn("__salt", saltFrom(col(uniqueCol), buckets))
    val partialAggs = aggs.map { case (n, c) => sum(c).as(n) }.toSeq
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val mergeAggs = aggs.keys.map(n => sum(col(n)).as(n)).toSeq
    partial
      .groupBy(keys.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
  }

  /** Skew-safe equi-join: replicate each `dim` row over `buckets`
    * salt values and SHUFFLE-join fact on (key, salt), so one hot key
    * spreads over `buckets` reducers. The shuffle_hash hint matters:
    * a broadcast join never shuffles the fact side, which makes
    * salting a no-op — if the dim broadcasts, you don't have a join
    * skew problem in the first place. This operator is for dims too
    * big to broadcast (or joins where broadcast is disabled) with a
    * hot fact key. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factUniqueCol: String,
      buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltFrom(col(factUniqueCol), buckets))
    val explodedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))) // one copy per salt
    saltedFact
      .join(explodedDim.hint("shuffle_hash"), Seq(key, "__salt"))
      .drop("__salt")
  }
}
