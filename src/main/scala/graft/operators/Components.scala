package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by iterative min-label
  * propagation — the Pregel superstep pattern (GraphX's
  * ConnectedComponents, HashToMin of Rastogi et al. ICDE'13),
  * driver-coordinated: each superstep is one shuffle join + one
  * map-side-combined min aggregation, and the loop stops at the
  * fixpoint. Near-dup canonicalization needs this: pair lists
  * (MinHash/SimHash/Jaccard output) only say "a~b"; choosing ONE
  * canonical row per duplicate cluster requires the transitive
  * closure, and min-label gives a deterministic canonical id.
  *
  * Scale: supersteps = graph diameter, and near-dup graphs are
  * shallow (clusters, not chains), so 3-6 rounds in practice.
  * localCheckpoint truncates lineage per round — without it the plan
  * doubles every superstep. The per-round count() is the convergence
  * barrier every iterative-graph system pays.
  */
object Components {

  /** @return (id, comp) for every node appearing in `edges`, where
    *         comp = min node id reachable via undirected edges. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    // Seed with the first propagation fused into init: comp(x) =
    // min(x, min neighbor) — one aggregate instead of an identity
    // round plus a join round.
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min("dst").as("min_nbr"))
      .select(col("id"), least(col("id"), col("min_nbr")).as("comp"))
      .localCheckpoint()
    // Labels only ever DECREASE (min of own and neighbors'), so the
    // label sum strictly decreases until the fixpoint — an O(1)-row
    // aggregate replaces the join+count convergence check.
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("comp"), lit(0L))).head.getLong(0) // empty graph → 0
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      // neighbor labels flow along edges; keep the min of (own, theirs)
      val prop = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum == prevSum
      prevSum = nextSum
      labels = next
    }
    labels
  }
}
