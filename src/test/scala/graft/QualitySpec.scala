package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

class QualitySpec extends SparkTestBase {
  import spark.implicits._

  private val rules = Map(
    "v_pos" -> (col("v") > 0),
    "name_set" -> col("name").isNotNull)

  private val df = Seq(
    (1L, 5L, Some("a")),            // clean
    (2L, -1L, Some("b")),           // v_pos fails
    (3L, 2L, None: Option[String]), // name_set fails
    (4L, -7L, None)                 // both fail
  ).toDF("id", "v", "name")

  test("audit counts violations per rule in one pass") {
    val a = Quality.audit(df, rules)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(a("v_pos") == (2L, 4L))
    assert(a("name_set") == (2L, 4L))
  }

  test("split separates clean rows and labels violations") {
    val (valid, invalid) = Quality.split(df, rules)
    assert(valid.select("id").as[Long].collect().toSeq == Seq(1L))
    val reasons = invalid.select(col("id"), col("violated"))
      .as[(Long, Seq[String])].collect().toMap
    assert(reasons(2L) == Seq("v_pos"))
    assert(reasons(3L) == Seq("name_set"))
    assert(reasons(4L).toSet == Set("v_pos", "name_set"))
  }

  test("NULL rule evaluations count as violations") {
    val d = Seq((1L, Some(3L)), (2L, None: Option[Long])).toDF("id", "x")
    val a = Quality.audit(d, Map("x_big" -> (col("x") > 1)))
      .as[(String, Long, Long)].collect().head
    assert(a == ("x_big", 1L, 2L), s"NULL comparison must violate: $a")
  }

  test("tryIngest: ON_ERROR=CONTINUE — quarantine with reasons, nulls load as NULL") {
    val raw = Seq(
      (1L, Some("12.5"), Some("2024-01-05")),   // clean
      (2L, Some("xx"), Some("2024-01-06")),     // duration malformed
      (3L, Some("7"), Some("9999-99-99")),      // date malformed
      (4L, Some("a"), Some("b")),               // both malformed
      (5L, None: Option[String], Some("2024-01-07")) // NULL raw ≠ error
    ).toDF("id", "raw_d", "raw_dt")
    val (valid, rejected) = Quality.tryIngest(raw, Seq(
      ("duration", col("raw_d"), expr("try_cast(raw_d AS DOUBLE)")),
      ("d", col("raw_dt"), expr("try_cast(raw_dt AS DATE)"))))

    // reconciliation: every input row routed exactly once
    assert(valid.count() + rejected.count() == raw.count())
    assert(valid.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 5L))
    // typed valid frame: casts applied, NULL raw loaded as NULL
    val v5 = valid.filter(col("id") === 5L)
      .select(col("duration"), col("d").cast("string")).collect().head
    assert(v5.isNullAt(0) && v5.getString(1) == "2024-01-07")
    // quarantine carries the ORIGINAL raw values + ordered reasons
    val r = rejected
      .select(col("id"), col("raw_d"), concat_ws(",", col("reject_reasons")).as("why"))
      .as[(Long, String, String)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(2L) == (("xx", "duration")))
    assert(r(3L)._2 == "d")
    assert(r(4L) == (("a", "duration,d")), "reason order follows the casts Seq")
  }

  test("validationErrors: RETURN_ERRORS dry-run — one row per error, parity with tryIngest") {
    val raw = Seq(
      (1L, Some("12.5"), Some("2024-01-05")),
      (2L, Some("xx"), Some("2024-01-06")),
      (3L, Some("7"), Some("9999-99-99")),
      (4L, Some("a"), Some("b")),
      (5L, None: Option[String], Some("2024-01-07"))
    ).toDF("id", "raw_d", "raw_dt")
    val casts = Seq(
      ("duration", col("raw_d"), expr("try_cast(raw_d AS DOUBLE)")),
      ("d", col("raw_dt"), expr("try_cast(raw_dt AS DATE)")))
    val errs = Quality.validationErrors(raw, casts, Seq(col("id")))
      .as[(Long, String, String)].collect().toSet
    // one row PER error: row 4 fails both casts -> two rows
    assert(errs == Set(
      (2L, "duration", "xx"),
      (3L, "d", "9999-99-99"),
      (4L, "duration", "a"),
      (4L, "d", "b")))
    // parity: the error'd row ids are exactly tryIngest's quarantine
    val (_, rejected) = Quality.tryIngest(raw, casts)
    assert(errs.map(_._1) == rejected.select("id").as[Long].collect().toSet)
  }

  test("masked: unprivileged redaction, privileged passthrough, typo'd policy fails") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, "Alice", 10.5)).toDF("k", "name", "bal")
    val pol = Map(
      "name" -> concat(substring(col("name"), 1, 1), lit("***")),
      "bal" -> lit(null).cast("double"))
    val shut = Quality.masked(df, pol, unmaskedWhen = lit(false)).head()
    assert(shut.getString(1) == "A***" && shut.isNullAt(2))
    val open = Quality.masked(df, pol, unmaskedWhen = lit(true)).head()
    assert(open.getString(1) == "Alice" && open.getDouble(2) == 10.5)
    // a policy naming an absent column must fail loudly, not silently
    // leave the (misspelled) real column unmasked
    intercept[IllegalArgumentException] {
      Quality.masked(df, Map("nmae" -> lit("x")), lit(false))
    }
  }
}
