package graft

import org.apache.spark.sql.functions._

/** Edge semantics for the function-surface family (QueriesFns) that
  * the sf data can't exercise: DST transitions (events span January
  * only) and extreme-carrier tie determinism. */
class FnsSpec extends SparkTestBase {
  import spark.implicits._

  test("convert_timezone handles the DST spring-forward (02:xx never exists in NY)") {
    // 2024-03-10 America/New_York: clocks jump 02:00 EST -> 03:00 EDT.
    // One minute before the jump is 01:59 EST (UTC-5); the jump minute
    // lands on 03:00 EDT (UTC-4). Tokyo has no DST: always UTC+9.
    val rows = Seq(
      "2024-03-10 06:59:00", // NY 01:59 EST
      "2024-03-10 07:00:00", // NY 03:00 EDT (02:00 does not exist)
      "2024-11-03 05:30:00", // NY 01:30 EDT (first pass of the repeated hour)
      "2024-11-03 06:30:00"  // NY 01:30 EST (second pass — same wall clock)
    ).toDF("utc").select(to_timestamp(col("utc")).as("ts"))
    val got = rows.select(
        convert_timezone(lit("UTC"), lit("America/New_York"), col("ts"))
          .cast("string").as("ny"),
        convert_timezone(lit("UTC"), lit("Asia/Tokyo"), col("ts"))
          .cast("string").as("tokyo"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got(0) == ("2024-03-10 01:59:00", "2024-03-10 15:59:00"))
    assert(got(1) == ("2024-03-10 03:00:00", "2024-03-10 16:00:00"))
    // the fall-back repeated hour: two distinct instants, one wall clock
    assert(got(2)._1 == "2024-11-03 01:30:00" && got(3)._1 == "2024-11-03 01:30:00")
    assert(got(2)._2 != got(3)._2, "Tokyo (no DST) must keep them distinct")
  }

  test("max_by/min_by struct ordering: equal values resolve by key, deterministically") {
    val df = Seq(
      ("g", 10L, 100.0), ("g", 20L, 100.0), // tied value
      ("g", 5L, 1.0), ("g", 7L, 1.0)        // tied at the min too
    ).toDF("grp", "k", "v")
    val r = df.groupBy("grp").agg(
        max_by(col("k"), struct(col("v"), col("k"))).as("hi"),
        min_by(col("k"), struct(col("v"), col("k"))).as("lo"))
      .head()
    assert(r.getLong(1) == 20L, "tied max resolves to the larger key")
    assert(r.getLong(2) == 5L, "tied min resolves to the smaller key")
  }
}
