package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-length packing (sequential fill): assign documents to
  * fixed-token-budget packs by cumulative token count in stable id
  * order — the LLM-prep step that turns a corpus into training
  * windows. A document lands in pack floor((cum - n) / budget), i.e.
  * the pack that was open when it arrived; packs overshoot the budget
  * by at most one document (greedy fill, no splitting).
  *
  * [[pack]] is the exact single-sequence form: ONE global-ordered
  * window, which Spark executes as a single-partition sort — correct,
  * and the right oracle baseline, but a scale-killer at 100 TB.
  * [[packSharded]] is the production form: the SAME expression with a
  * shard key in the PARTITION BY, so every shard fills independently
  * in parallel (shuffle on shard, per-partition sort, no global
  * order). Pack ids are per-shard; (shard, pack_id) is the global
  * key. Sharding only changes WHICH documents share a pack (shards
  * fill from their own id order), not any budget invariant — each
  * shard's packing is exactly [[pack]] applied to that shard's rows.
  */
object DocPack {

  /** Cumulative-fill packing over the whole frame in `idCol` order.
    * Input must carry (idCol, nTokCol); appends cum_tokens, pack_id. */
  def pack(df: DataFrame, idCol: String, nTokCol: String, budget: Int): DataFrame =
    packBy(df, Window.orderBy(idCol), nTokCol, budget)

  /** Per-shard cumulative-fill packing: independent sequential fill
    * within each `shardCol` value, `idCol` order inside the shard.
    * This is the 100-TB form — the window partitions on the shard key
    * so no global sort exists in the plan. */
  def packSharded(df: DataFrame, shardCol: String, idCol: String,
      nTokCol: String, budget: Int): DataFrame =
    packBy(df, Window.partitionBy(shardCol).orderBy(idCol), nTokCol, budget)

  private def packBy(df: DataFrame, w: org.apache.spark.sql.expressions.WindowSpec,
      nTokCol: String, budget: Int): DataFrame =
    df.withColumn("cum_tokens",
        sum(nTokCol).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pack_id",
        floor((col("cum_tokens") - col(nTokCol)) / budget).cast("long"))
}
