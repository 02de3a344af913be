package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc plan/time profiler for local iteration (not part of the
  * library surface). `sbt "runMain graft.Prof"` times named variants of
  * the query under investigation, min of two passes, noop sink (same
  * contract as Bench).
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(df: => DataFrame): Unit = {
      def once: Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once // warm
      val t = math.min(once, once)
      println(f"$name%-40s $t%8.3f s")
    }
    // warm tables
    Seq("events", "customer").foreach(t => sources.ViewingData.table(spark, dir, t).count())

    time("weighted_events (as-is)")(Pipeline.weightedEvents(spark, dir))
    time("weighted_events via queries registry")(SparkEntry.queries("q_weighted_events")(spark, dir))
    time("viewing_events only")(Pipeline.viewingEvents(spark, dir))
    time("viewing_events minus application")(
      Pipeline.viewingEvents(spark, dir).drop("application"))
    time("weighted minus application")(
      Pipeline.weightedEvents(spark, dir).drop("application"))
    time("weighted repartition-after-scan")(
      Pipeline.weightedFrom(
        Pipeline.viewingEvents(spark, dir).repartition(32),
        Pipeline.panelWindows(spark, dir),
        sources.ViewingData.geoWeights(spark, dir)))
    time("events raw scan")(sources.ViewingData.table(spark, dir, "events"))
    time("regexp only over events")(
      sources.ViewingData.table(spark, dir, "events")
        .select(regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("application")))
    spark.stop()
  }
}
