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
}
