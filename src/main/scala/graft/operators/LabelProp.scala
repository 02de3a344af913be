package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan 2007) as a driver-
  * coordinated fixpoint operator — the community-detection sibling of
  * [[Components]]. Deterministic throughout: every node
  * simultaneously adopts the MODE of its neighbors' labels, ties
  * toward the smallest label ((count DESC, label ASC) row_number —
  * the async/random-order variants converge faster but aren't
  * reproducible, and a pipeline signal must be).
  *
  * Synchronous LPA has a known failure mode the fixpoint driver must
  * handle: on bipartite-ish structures the labels OSCILLATE with
  * period 2 (the textbook example: one edge a—b swaps labels forever).
  * The loop therefore tests each round against the previous state
  * (fixpoint) AND the state two rounds back (2-cycle); on a cycle it
  * stops and returns the cycle state with the smaller label sum — a
  * deterministic choice between the two alternating states.
  *
  * Per round: ONE |edges| shuffle (adjacency ⋈ labels) + a map-side-
  * combined (node, label) count + a map-side-combined min_by modal
  * pick (no sort anywhere in the round), labels
  * localCheckpoint'd so lineage stays flat; the convergence barrier
  * is a join-and-count like Components' label-sum barrier (label sums
  * here aren't monotone, so the exact compare is the honest check).
  */
object LabelProp {

  case class Result(labels: DataFrame, rounds: Int, cycled: Boolean)

  /** One synchronous round: every node adopts its neighbors' modal
    * label. `adj` must be the both-direction adjacency (a, b).
    *
    * The modal pick is a `min_by` over (−count, label) — identical to
    * the (count DESC, label ASC) row_number it replaces (r13, guide
    * §2.4: an orderless aggregate where a window only picks a per-key
    * extremum): same argmax, same tie-break, but the per-node top-1
    * folds map-side inside the count exchange instead of paying a
    * second exchange + sort per round. */
  def step(adj: DataFrame, labels: DataFrame): DataFrame =
    adj.join(labels.withColumnRenamed("node", "b"), "b")
      .groupBy(col("a").as("node"), col("label"))
      .agg(count(lit(1)).as("c"))
      .groupBy("node")
      .agg(min_by(col("label"), struct(-col("c"), col("label"))).as("label"))
      .select("node", "label")

  /** Self-labeled start: every node is its own community. */
  def seed(adj: DataFrame): DataFrame =
    adj.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))

  private def differs(x: DataFrame, y: DataFrame): Boolean =
    x.join(y.withColumnRenamed("label", "l2"), "node")
      .filter(col("label") =!= col("l2"))
      .isEmpty == false

  private def labelSum(x: DataFrame): Long =
    x.agg(coalesce(sum("label"), lit(0L))).head.getLong(0)

  /** Runs to the fixpoint (or a detected 2-cycle), bounded by
    * `maxRounds` as the oscillation backstop. */
  def propagate(adj0: DataFrame, maxRounds: Int = 32): Result = {
    val adj = adj0.localCheckpoint()
    var prevPrev: DataFrame = null
    var prev = seed(adj).localCheckpoint()
    var rounds = 0
    while (rounds < maxRounds) {
      rounds += 1
      val next = step(adj, prev).localCheckpoint()
      if (!differs(next, prev))
        return Result(prev, rounds, cycled = false)
      if (prevPrev != null && !differs(next, prevPrev)) {
        // 2-cycle: next replays prevPrev — pick the alternating state
        // with the smaller label sum (deterministic; on equal sums the
        // earlier state, which `next` equals, wins)
        val pick = if (labelSum(prev) < labelSum(next)) prev else next
        return Result(pick, rounds, cycled = true)
      }
      prevPrev = prev
      prev = next
    }
    Result(prev, rounds, cycled = false)
  }
}
