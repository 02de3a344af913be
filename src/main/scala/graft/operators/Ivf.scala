package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** IVF (inverted-file) approximate nearest neighbor: partition the
  * corpus into coarse cells, search only the query's nearest
  * `nprobe` cells — the FAISS IVF-Flat shape on DataFrames.
  *
  * Cells here are seeded from an existing coarse key (a cluster
  * label, a category, a shard) and refined to actual centroids by
  * element-wise mean; a k-means loop would iterate [[assign]] +
  * [[centroids]] to convergence with the same two primitives.
  *
  * Scale: the centroid table is tiny (cells × dim) → every centroid
  * comparison is a broadcast; the corpus shuffles once on cell id at
  * index build, and a probe touches nprobe/cells of the data. That
  * fraction — not the corpus size — is the query cost at 100 TB.
  */
object Ivf {

  /** Element-wise mean per cell: posexplode → (cell, pos) avg →
    * re-assemble ordered by pos. One narrow shuffle of (cells × dim)
    * groups; map-side partial avg keeps it |cells|·dim-sized. */
  def centroids(v: DataFrame, cellCol: String, vecCol: String): DataFrame =
    v.select(col(cellCol), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .groupBy(col(cellCol), col("pos")).agg(avg("x").as("m"))
      .groupBy(col(cellCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col(cellCol),
        normalize(transform(col("pm"), p => p.getField("m"))).as("centroid"))

  /** Assign every vector to its highest-cosine centroid (vectors must
    * be unit-normalized; ties break on the greater cell id for
    * determinism). Returns (idCol, vecCol, cellCol); the original seed
    * cell is REPLACED by the refined one.
    *
    * max_by over the |corpus|×|cells| crossJoin gets map-side partial
    * aggregation — the shuffle carries one row per vector, not per
    * (vector, cell), which is the |cells|× difference a window-rank
    * formulation would pay at scale. */
  def assign(v: DataFrame, cents: DataFrame, idCol: String, vecCol: String,
      cellCol: String): DataFrame = {
    val c = cents.withColumnRenamed(cellCol, "__cell")
    v.drop(cellCol)
      .crossJoin(broadcast(c))
      .withColumn("__sim", dotNative(col(vecCol), col("centroid")))
      .groupBy(idCol)
      .agg(max_by(
        struct(col(vecCol), col("__cell")),
        struct(col("__sim"), col("__cell"))).as("__best"))
      .select(col(idCol),
        col(s"__best.$vecCol").as(vecCol),
        col("__best.__cell").as(cellCol))
  }

  /** Lloyd refinement: alternate [[centroids]] / [[assign]] from the
    * seed cells. Spherical k-means on DataFrames — each round is one
    * narrow centroid aggregate + one broadcast re-assignment, with
    * checkpoints truncating lineage. Quantization error (mean cosine
    * to own centroid) is non-decreasing per round; a handful of
    * rounds is standard for IVF index builds. Returns (index, cents).
    *
    * Storage: each round's checkpoint supersedes the last; dropped
    * rounds' blocks are reclaimed by Spark's ContextCleaner once the
    * old DataFrame references go out of scope (they do — the vars are
    * reassigned), so steady-state storage is one corpus copy plus the
    * in-flight round, not rounds× copies. */
  def refine(v: DataFrame, idCol: String, vecCol: String, cellCol: String,
      rounds: Int): (DataFrame, DataFrame) = {
    val base = v.localCheckpoint()
    var index = base
    var cents = centroids(index, cellCol, vecCol).localCheckpoint()
    for (_ <- 0 until rounds) {
      index = assign(base, cents, idCol, vecCol, cellCol).localCheckpoint()
      cents = centroids(index, cellCol, vecCol).localCheckpoint()
    }
    (index, cents)
  }

  /** Persists a built index CELL-PARTITIONED (`cells/<cellCol>=…`
    * directories + a single-file centroid table): the production
    * build-once/probe-many layout. Because the corpus lands one
    * directory per cell, a probe becomes a PARTITION-PRUNED read —
    * nprobe directories opened, the rest of the 100-TB index never
    * listed, which is the file-level analogue of the in-memory
    * cell filter. */
  def writeIndex(index: DataFrame, cents: DataFrame, cellCol: String,
      path: String): Unit = {
    index.write.partitionBy(cellCol).mode("overwrite").parquet(s"$path/cells")
    cents.coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
  }

  /** Probe a [[writeIndex]]-persisted index. Centroid ranking runs on
    * the (tiny) centroid table and the winning `nprobe` cell ids are
    * collected driver-side — control-plane metadata, like any
    * partition predicate — so the cells scan carries a LITERAL
    * partition filter and prunes statically at file listing. */
  def probeIndexed(spark: org.apache.spark.sql.SparkSession, path: String,
      query: DataFrame, idCol: String, vecCol: String, cellCol: String,
      nprobe: Int, k: Int, qCol: String = "q"): DataFrame = {
    val cents = spark.read.parquet(s"$path/centroids")
    val qCells = query.crossJoin(broadcast(cents))
      .withColumn("__sim", dotNative(col(qCol), col("centroid")))
      .orderBy(col("__sim").desc, col(cellCol)).limit(nprobe)
      .select(col(cellCol)).collect().map(_.get(0))
    spark.read.parquet(s"$path/cells")
      .filter(col(cellCol).isin(qCells.toIndexedSeq: _*))
      .crossJoin(broadcast(query))
      .select(col(idCol), col(cellCol),
        round(dotNative(col(vecCol), col(qCol)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol)).limit(k)
  }

  /** Top-k by cosine for one query vector, searching only its
    * `nprobe` nearest cells. `index` must carry (idCol, vecCol,
    * cellCol) with unit-normalized vectors — build it once via
    * [[centroids]] + [[assign]] and reuse across queries.
    *
    * `query` must be a SINGLE-ROW DataFrame whose unit-normalized
    * query vector lives in column `qCol` (default "q") — a multi-row
    * query would cross-join every row into the probe and interleave
    * the top-k. */
  def probe(index: DataFrame, cents: DataFrame, query: DataFrame,
      idCol: String, vecCol: String, cellCol: String,
      nprobe: Int, k: Int, qCol: String = "q"): DataFrame = {
    val qCells = query.crossJoin(broadcast(cents))
      .withColumn("__sim", dotNative(col(qCol), col("centroid")))
      .orderBy(col("__sim").desc, col(cellCol)).limit(nprobe)
      .select(col(cellCol))
    index
      .join(broadcast(qCells), cellCol)
      .crossJoin(broadcast(query))
      .select(col(idCol), col(cellCol),
        round(dotNative(col(vecCol), col(qCol)), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol)).limit(k)
  }
}
