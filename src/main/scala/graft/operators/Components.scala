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
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      // neighbor labels flow along edges; keep the min of (own, theirs)
      val prop = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      changed = next.as("n")
        .join(labels.as("p"), "id")
        .filter(col("n.comp") =!= col("p.comp"))
        .count()
      labels = next
    }
    labels
  }
}
