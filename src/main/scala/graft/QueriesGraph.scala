package graft

import org.apache.spark.sql.functions._

import graft.sources.ViewingData

/** Graph analytics beyond PageRank (F17) — same synthetic doc graph
  * (tree edges doc→doc/7 plus cross edges doc→doc·31 mod 500) so the
  * family composes.
  */
object QueriesGraph {

  /** Triangle counting with DEGREE ORIENTATION (Suri &
    * Vassilvitskii 2011 — "the curse of the last reducer"): orient
    * every undirected edge from its lower-(degree, id) endpoint to
    * the higher one, build wedges only from each vertex's OUT-edges,
    * and close them against the oriented edge set. Orientation bounds
    * out-degree by O(√m) regardless of how skewed the raw degree
    * distribution is — the naive wedge join dies on the highest-degree
    * vertex (d² wedges on one reducer); the oriented one provably
    * cannot. Each triangle is counted exactly once, at its
    * minimum-(degree, id) vertex; per-vertex counts come from
    * exploding the triangle's three corners. Joins are plain
    * equi-joins (AQE handles residual skew); the degree table is a
    * |V|-row aggregate. */
  private val triangles = Q(
    "graph_triangles",
    (s, dir) => {
      val docs = ViewingData.table(s, dir, "documents").select(col("doc_id"))
      val tree = docs.filter(col("doc_id") > 0)
        .select(col("doc_id").as("src"),
          floor(col("doc_id") / 7).cast("long").as("dst"))
      val cross = docs
        .select(col("doc_id").as("src"),
          pmod(col("doc_id") * 31, lit(500)).cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
      // ring + doubling families densify the demo graph into one with
      // real triangle structure (456 triangles at sf0.01 vs 1 from
      // tree+cross alone)
      val ring = docs.select(col("doc_id").as("src"),
        pmod(col("doc_id") + 1, lit(500)).cast("long").as("dst"))
      val dbl = docs
        .select(col("doc_id").as("src"),
          pmod(col("doc_id") * 2, lit(500)).cast("long").as("dst"))
        .filter(col("src") =!= col("dst"))
      val und = tree.unionByName(cross).unionByName(ring).unionByName(dbl)
        .filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
        .localCheckpoint() // one edge materialization feeds degrees AND orientation
      val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
        .groupBy("x").agg(count(lit(1)).as("dg"))
      val fwd = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
      val o = und
        .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
        .select(
          when(fwd, col("u")).otherwise(col("v")).as("src"),
          when(fwd, col("v")).otherwise(col("u")).as("dst"),
          when(fwd, col("dv")).otherwise(col("du")).as("ddg"))
        .localCheckpoint() // consumed three times (two wedge sides + close)
      val e1 = o.select(col("src").as("a"), col("dst").as("b"), col("ddg").as("db"))
      val e2 = o.select(col("src").as("a"), col("dst").as("c"), col("ddg").as("dc"))
      val close = o.select(col("src").as("b"), col("dst").as("c"))
      val tri = e1.join(e2, Seq("a"))
        .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
        .join(close, Seq("b", "c"))
        .select(col("a"), col("b"), col("c"))
      tri.select(explode(array(col("a"), col("b"), col("c"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
    },
    Some("""WITH d AS (SELECT doc_id FROM documents),
raw AS (
  SELECT doc_id AS src, CAST(floor(doc_id / 7) AS BIGINT) AS dst
  FROM d WHERE doc_id > 0
  UNION ALL
  SELECT doc_id AS src, CAST(doc_id * 31 % 500 AS BIGINT) AS dst
  FROM d WHERE doc_id <> doc_id * 31 % 500
  UNION ALL
  SELECT doc_id AS src, CAST((doc_id + 1) % 500 AS BIGINT) AS dst FROM d
  UNION ALL
  SELECT doc_id AS src, CAST(doc_id * 2 % 500 AS BIGINT) AS dst
  FROM d WHERE doc_id <> doc_id * 2 % 500),
und AS (
  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
  FROM raw WHERE src <> dst),
deg AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS dg
  FROM (SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und)
  GROUP BY 1),
o AS (
  SELECT CASE WHEN (du.dg, u) < (dv.dg, v) THEN u ELSE v END AS src,
         CASE WHEN (du.dg, u) < (dv.dg, v) THEN v ELSE u END AS dst,
         CASE WHEN (du.dg, u) < (dv.dg, v) THEN dv.dg ELSE du.dg END AS ddg
  FROM und
  JOIN deg du ON du.x = und.u
  JOIN deg dv ON dv.x = und.v),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM o e1
  JOIN o e2 ON e1.src = e2.src
           AND (e1.ddg, e1.dst) < (e2.ddg, e2.dst)
  JOIN o e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
SELECT x AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri
FROM (SELECT a AS x FROM tri UNION ALL SELECT b AS x FROM tri
      UNION ALL SELECT c AS x FROM tri)
GROUP BY 1"""))

  val all: Seq[Q] = Seq(triangles)
}
