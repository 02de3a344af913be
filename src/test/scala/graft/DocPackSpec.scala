package graft

import org.apache.spark.sql.functions._

import graft.operators.DocPack

/** packSharded ≡ pack applied independently per shard, plus the
  * sequential-fill budget invariants and the plan-shape guarantee
  * (partitioned window → no single-partition global sort). */
class DocPackSpec extends SparkTestBase {

  private lazy val docs = graft.sources.ViewingData
    .table(spark, Sf, "documents")
    .select(col("doc_id"),
      pmod(col("doc_id"), lit(4)).as("shard"),
      (length(col("text")) % 100 + 1).cast("long").as("n_tokens"))

  test("sharded pack equals per-shard global pack (union parity)") {
    val sharded = DocPack.packSharded(docs, "shard", "doc_id", "n_tokens", 512)
      .select("doc_id", "shard", "cum_tokens", "pack_id")
    val perShard = (0 until 4).map { sh =>
      DocPack.pack(docs.filter(col("shard") === sh), "doc_id", "n_tokens", 512)
        .select("doc_id", "shard", "cum_tokens", "pack_id")
    }.reduce(_ unionAll _)
    assert(sharded.exceptAll(perShard).isEmpty && perShard.exceptAll(sharded).isEmpty)
  }

  test("budget invariants hold within every shard") {
    val packed = DocPack.packSharded(docs, "shard", "doc_id", "n_tokens", 512)
    // pack_id is the closed form of cum_tokens (floor of the open
    // offset), and a pack's open offset is always < budget: a doc
    // starts in the pack that had room when it arrived.
    assert(packed.filter(
      col("pack_id") =!= floor((col("cum_tokens") - col("n_tokens")) / 512)).isEmpty)
    assert(packed.filter(
      (col("cum_tokens") - col("n_tokens")) - col("pack_id") * 512 >= 512).isEmpty)
    // cum_tokens strictly increases in doc_id order within a shard
    // (n_tokens >= 1 here), so packs are contiguous id ranges.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
    assert(packed
      .withColumn("prev", lag("cum_tokens", 1).over(w))
      .filter(col("prev").isNotNull && col("cum_tokens") <= col("prev"))
      .isEmpty)
  }

  test("sharded plan has no unpartitioned window (no global sort)") {
    val plan = DocPack.packSharded(docs, "shard", "doc_id", "n_tokens", 512)
      .queryExecution.executedPlan.toString
    // Every Window node must carry a partition spec; the global form
    // (DocPack.pack) is exactly this plan minus the partitioning.
    assert(plan.contains("Window"))
    assert(!plan.contains("windowspecdefinition(doc_id#"),
      "found an unpartitioned window spec:\n" + plan)
  }
}
