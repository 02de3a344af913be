package graft

import org.apache.spark.sql.Row

/** Pins the 100-TB mechanism behind `q_runtime_filter`: Catalyst's
  * `InjectRuntimeFilter` must plant a bloom probe (built from the
  * filtered dim's join keys) on the FACT side of the join, so the
  * big scan is pruned before the shuffle. Locally the 10 GB
  * application-side threshold keeps the rule off (correctly — the
  * fact scan IS small), so the spec lowers the thresholds to make
  * sf0.001 look like a cluster-sized scan and asserts (a) the probe
  * lands below the join on the fact side, and (b) the pruned plan's
  * rows are the exact join's rows (a bloom false positive only lets
  * a row through to the join, never changes the result).
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def keyed(rows: Array[Row]): Map[(String, String), (Long, Long, Double)] =
    rows.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("default confs: no injection at local scale (threshold is doing its job)") {
    val df = SparkEntry.queries("q_runtime_filter")(spark, Sf)
    assert(!df.queryExecution.optimizedPlan.toString.contains("might_contain"),
      "bloom probe must NOT fire under the default 10 GB application-side threshold")
  }

  test("lowered thresholds: bloom probe lands on the fact side, rows unchanged") {
    val baseline = keyed(SparkEntry.queries("q_runtime_filter")(spark, Sf).collect())
    assert(baseline.nonEmpty)
    val (optimized, rows) = withConfs(
      // force a shuffle join: InjectRuntimeFilter skips joins that will
      // broadcast anyway (the probe would prune nothing the broadcast
      // hash lookup doesn't already skip)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // make the local fact scan "cluster-sized"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0"
    ) {
      val df = SparkEntry.queries("q_runtime_filter")(spark, Sf)
      (df.queryExecution.optimizedPlan.toString, df.collect())
    }
    assert(optimized.contains("might_contain"),
      s"expected a bloom runtime filter in the optimized plan:\n$optimized")
    // the probe must be keyed on the fact join key, i.e. prune lineitem
    assert(optimized.contains("might_contain") && optimized.contains("l_partkey"),
      "bloom probe must test the fact-side join key")
    val got = keyed(rows)
    assert(got.keySet == baseline.keySet)
    got.foreach { case (k, (n, qty, rev)) =>
      val (bn, bqty, brev) = baseline(k)
      assert(n == bn && qty == bqty, s"$k: counts diverged under the bloom probe")
      assert(math.abs(rev - brev) < 0.011, s"$k: revenue diverged: $rev vs $brev")
    }
  }
}
