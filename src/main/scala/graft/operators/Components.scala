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

  /** Connected components by the ALTERNATING two-phase star algorithm
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — O(log n) rounds instead of min-propagation's
    * O(diameter). The distinction is invisible on shallow near-dup
    * clusters but decisive on long-diameter graphs: a percolated
    * geometric graph (q_geo_dbscan's ×10 sweep replica, diameter ≈
    * 70 cells) runs ~70 supersteps under min-propagation and ~a dozen
    * here. Same contract as [[connectedComponents]]: (id, comp) for
    * every node appearing in `edges`, comp = min reachable id.
    *
    * Each phase re-points part of every node's neighborhood at the
    * neighborhood minimum m(u) = min(Γ(u) ∪ {u}):
    *   large-star: (v, m(u)) for v ∈ Γ(u), v > u  — larger neighbors
    *   small-star: (v, m(u)) for v ∈ Γ(u), v < u, plus (u, m(u))
    * Both preserve connectivity; alternating them converges to a
    * forest of stars whose centers are the component minima.
    * Convergence = the (count, Σu, Σv) signature of the canonical
    * (min,max)-form edge set repeating — the same O(1)-row-aggregate
    * barrier the min-propagation loop uses. */
  def connectedComponentsStar(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    var e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint()
    // remember every input node: star rounds may drop a node's edges
    // once it coincides with its component min
    val nodes = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id"))).distinct().localCheckpoint()

    // Order-independent fixpoint signature. (count, Σu, Σv) alone can
    // collide across DIFFERENT edge sets ({(1,4),(2,3)} vs {(1,3),(2,4)}
    // both give (2,3,7)) — a colliding-but-changed round would stop the
    // loop early with wrong labels. Σ xxhash64(u,v) over the canonical
    // (min,max) pairs breaks such collisions: any single-edge swap moves
    // the hash sum except with negligible 2^-64-scale probability, and
    // the aggregate stays O(1) rows. The hash sum accumulates in
    // decimal(38,0) — a long sum of 64-bit hashes overflows (ANSI
    // throws) after a handful of edges.
    def sig(df: DataFrame): Seq[Any] = df.agg(
      count(lit(1)), coalesce(sum("u"), lit(0L)), coalesce(sum("v"), lit(0L)),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head.toSeq
    def phase(cur: DataFrame, large: Boolean): DataFrame = {
      val sym = cur.select(col("u"), col("v"))
        .union(cur.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min("v").as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val withM = sym.join(m, "u")
      val out =
        if (large) withM.filter(col("v") > col("u"))
          .select(col("v").as("a"), col("m").as("b"))
        else withM.filter(col("v") < col("u"))
          .select(col("v").as("a"), col("m").as("b"))
          .union(m.select(col("u").as("a"), col("m").as("b")))
      out.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .localCheckpoint()
    }

    var prev = sig(e)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      require(rounds <= 64, "alternating-star CC failed to converge in 64 rounds")
      val next = phase(phase(e, large = true), large = false)
      val s = sig(next)
      converged = s == prev
      prev = s
      e = next
    }
    // converged stars: every node's min neighbor IS its component min
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    nodes.join(sym.groupBy(col("u").as("id")).agg(min("v").as("mn")), Seq("id"), "left")
      .select(col("id"), least(col("id"), coalesce(col("mn"), col("id"))).as("comp"))
  }

  /** [[connectedComponents]] with the algorithm picked by a CHEAP
    * PROBE instead of the caller: run `probeRounds` min-propagation
    * supersteps; if unconverged, measure the fraction of labels that
    * still changed in the last probe round. Shallow near-dup graphs
    * (clusters, diameter 2-4) have settled almost everywhere by then
    * — keep min-propagation, whose per-round cost is lower than a
    * star double-phase. A high changed fraction is a PERCOLATION
    * signal (labels still walking a long diameter — a chain moves its
    * frontier one hop per round, so the unsettled share stays large
    * for ~diameter rounds): restart on the O(log n)-round alternating
    * star. The probe costs the rounds min-propagation would have run
    * anyway plus ONE O(1)-row changed-count aggregate; both engines
    * emit comp = min reachable id, so the pick never changes labels
    * (ComponentsSpec pins both shapes; the star path needs
    * long-castable node ids).
    *
    * @return (labels, picked) — picked ∈ {"minprop", "star"} for
    *         specs/telemetry; use [[connectedComponentsAuto]] when
    *         only the labels matter. */
  def connectedComponentsAutoWithChoice(
      edges: DataFrame, srcCol: String, dstCol: String,
      probeRounds: Int = 3,
      percolationThreshold: Double = 0.2): (DataFrame, String) = {
    require(probeRounds >= 1, s"probeRounds must be >= 1, got $probeRounds")
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = sym.groupBy(col("src").as("id"))
      .agg(min("dst").as("min_nbr"))
      .select(col("id"), least(col("id"), col("min_nbr")).as("comp"))
      .localCheckpoint()
    def labelSum(df: DataFrame): Long =
      df.agg(coalesce(sum("comp"), lit(0L))).head.getLong(0)
    var prevSum = labelSum(labels)
    var rounds = 0
    while (true) {
      rounds += 1
      val prop = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("comp"))
      val next = labels.unionByName(prop)
        .groupBy("id").agg(min("comp").as("comp"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      if (nextSum == prevSum) return (next, "minprop") // fixpoint
      if (rounds == probeRounds) {
        // one O(1)-row probe readout: how much of the graph is still
        // moving? (labels only decrease, so changed = strictly less)
        val r = next.join(labels.withColumnRenamed("comp", "__prev"), "id")
          .agg(count(lit(1)),
            sum(when(col("comp") < col("__prev"), 1L).otherwise(0L))).head
        val total = r.getLong(0)
        val changed = r.getLong(1)
        if (total > 0 && changed.toDouble / total >= percolationThreshold)
          return (connectedComponentsStar(edges, srcCol, dstCol), "star")
      }
      prevSum = nextSum
      labels = next
    }
    throw new IllegalStateException("unreachable")
  }

  /** [[connectedComponentsAutoWithChoice]] returning only the labels. */
  def connectedComponentsAuto(
      edges: DataFrame, srcCol: String, dstCol: String,
      probeRounds: Int = 3,
      percolationThreshold: Double = 0.2): DataFrame =
    connectedComponentsAutoWithChoice(
      edges, srcCol, dstCol, probeRounds, percolationThreshold)._1
}
