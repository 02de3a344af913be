package graft

import org.apache.spark.sql.functions._
import graft.operators.Hierarchy

/** CONNECT BY traversal: multi-root forests, path materialization,
  * and orphan-cycle surfacing (where SQL CONNECT BY would loop). */
class HierarchySpec extends SparkTestBase {
  import spark.implicits._

  test("forest with two roots: roots, depths, and paths are exact") {
    val nodes = Seq(
      (1L, None: Option[Long]),   // root A
      (2L, Some(1L)), (3L, Some(1L)),
      (4L, Some(3L)),
      (10L, None: Option[Long]),  // root B
      (11L, Some(10L))
    ).toDF("id", "parent")
    val out = Hierarchy.connectBy(nodes, "id", "parent")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getString(3)))).toMap
    assert(out(1L) == ((1L, 0, "1")))
    assert(out(4L) == ((1L, 2, "1/3/4")))
    assert(out(11L) == ((10L, 1, "10/11")))
    assert(out.size == 6)
  }

  test("orphan cycle surfaces as NULL root instead of looping") {
    val nodes = Seq(
      (1L, None: Option[Long]), (2L, Some(1L)),
      (8L, Some(9L)), (9L, Some(8L)) // 2-cycle unreachable from a root
    ).toDF("id", "parent")
    val out = Hierarchy.connectBy(nodes, "id", "parent")
    assert(out.count() == 4)
    val orphans = out.filter(col("root_id").isNull)
      .select("id").as[Long].collect().sorted
    assert(orphans.toSeq == Seq(8L, 9L))
  }
}
