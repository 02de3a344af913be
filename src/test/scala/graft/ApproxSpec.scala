package graft

import org.apache.spark.sql.functions._

class ApproxSpec extends SparkTestBase {
  import spark.implicits._

  test("q_approx sketches stay within tolerance of exact answers") {
    val dir = "/root/testdata/sf0.01"
    val approx = SparkEntry.queries("q_approx")(spark, dir)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val exact = graft.sources.ViewingData.table(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        countDistinct("user_id").as("users"),
        expr("percentile(value, 0.5)").as("median"),
        expr("percentile(value, 0.95)").as("p95"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (users, med, p95)) <- exact) {
      val (aU, aMed, aP95) = approx(k)
      assert(math.abs(aU - users).toDouble / users <= 0.05,
        s"$k approx users $aU vs exact $users")
      assert(math.abs(aMed - med) / math.max(med, 1e-9) <= 0.05,
        s"$k approx median $aMed vs exact $med")
      assert(math.abs(aP95 - p95) / math.max(p95, 1e-9) <= 0.05,
        s"$k approx p95 $aP95 vs exact $p95")
    }
  }
}
