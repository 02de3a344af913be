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

  test("FLATTEN outer: empty, null, and malformed arrays keep their parent row") {
    // q_flatten's ACR genres always hold two elements — the OUTER
    // semantics (FLATTEN(.., OUTER => TRUE)) are pinned here instead.
    val df = Seq(
      (1L, """["a","b"]"""),
      (2L, "[]"),
      (3L, null.asInstanceOf[String]),
      (4L, "not json")
    ).toDF("event_id", "genres")
    val out = df.select(col("event_id"),
        posexplode_outer(from_json(col("genres"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType))))
      .withColumnRenamed("col", "genre")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))
      .sortBy(r => (r._1, r._2.getOrElse(-1)))
    assert(out.toSeq == Seq(
      (1L, Some(0), Some("a")), (1L, Some(1), Some("b")),
      (2L, None, None),   // empty array: parent survives with null pos
      (3L, None, None),   // null input
      (4L, None, None)),  // unparseable → from_json null → outer row
      s"got ${out.toSeq}")
  }

  test("ewma: hand-computed fixpoints (single row, two rows, constant series)") {
    def ew(xs: Seq[Double]): Double =
      Seq(xs).toDF("xs").select(QueriesFns.ewmaOf(col("xs"), 0.7).as("e"))
        .head().getDouble(0)
    assert(math.abs(ew(Seq(5.0)) - 5.0) < 1e-12, "m=1: ewma is the value itself")
    // two rows: (0.7*x1 + x2) / 1.7
    assert(math.abs(ew(Seq(10.0, 20.0)) - (0.7 * 10 + 20) / 1.7) < 1e-12)
    // constant series of any length: ewma equals the constant
    assert(math.abs(ew(Seq.fill(10)(3.25)) - 3.25) < 1e-12)
    // weights favor the most recent: ewma of [0,...,0,1] > mean
    val n = 10
    assert(ew(Seq.fill(n - 1)(0.0) :+ 1.0) > 1.0 / n)
  }

  test("deterministic mode: frequency ties resolve to the smallest bucket") {
    val df = Seq(
      ("g", 7L), ("g", 7L), ("g", 2L), ("g", 2L), ("g", 9L), // tie 7 vs 2
      ("h", 1L)                                               // singleton group
    ).toDF("grp", "bucket")
    val got = QueriesFns.deterministicMode(df, "grp", "bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("g", 2L, 2L, 3L), ("h", 1L, 1L, 1L)),
      s"tie must pick bucket 2 over 7; got ${got.toSeq}")
  }
}
