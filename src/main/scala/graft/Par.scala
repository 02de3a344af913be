package graft

import org.apache.spark.sql.DataFrame

/** Local-parallelism guard for expensive per-row work.
  *
  * A single parquet file with one row group plans as ONE scan task, so
  * an expensive projection (interpreted higher-order functions, per-row
  * regex) serializes on one core — a local[N] artifact: at production
  * scale the scan has orders of magnitude more splits than cores, and
  * parallelism comes from the files themselves. `widen` repartitions
  * ONLY when the planned scan would leave most of the cluster idle, so
  * at scale it is the identity (zero shuffle) while locally it unlocks
  * the full machine. Callers should prune to the needed columns first
  * so the round-robin exchange carries minimal width.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // df.rdd is plan translation only — no job runs here
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
