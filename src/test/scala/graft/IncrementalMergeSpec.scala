package graft

import graft.operators.IncrementalMerge

class IncrementalMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("insertOnly appends only rows with unseen keys") {
    val target = Seq((1L, "a", 10), (2L, "b", 20)).toDF("k", "sub", "v")
    val batch = Seq((2L, "b", 99), (3L, "c", 30)).toDF("k", "sub", "v")
    val out = IncrementalMerge.insertOnly(target, batch, Seq("k", "sub"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)))
  }

  test("upsert: matched keys take batch values, batch deduped by version, rest kept") {
    val target = Seq((1L, 10, 100L), (2L, 20, 101L), (2L, 21, 102L)).toDF("k", "v", "ver")
    val batch = Seq(
      (2L, 90, 200L), (2L, 99, 201L), // same key twice: ver 201 wins
      (3L, 30, 202L)).toDF("k", "v", "ver")
    val out = IncrementalMerge.upsert(target, batch, Seq("k"), Seq("ver"))
      .as[(Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // BOTH target rows for k=2 are replaced by the single newest batch
    // row; k=1 untouched; k=3 inserted
    assert(out.toSeq == Seq((1L, 10, 100L), (2L, 99, 201L), (3L, 30, 202L)))
  }

  test("affectedKeys returns distinct group keys of the batch") {
    val batch = Seq((1L, "x"), (1L, "x"), (2L, "y")).toDF("hh", "title")
    assert(IncrementalMerge.affectedKeys(batch, Seq("hh", "title")).count() == 2)
  }

  test("watermark = least of per-source max dates, with floor for empty") {
    import java.sql.Date
    val s1 = Seq(Date.valueOf("2024-01-10"), Date.valueOf("2024-01-20")).toDF("d")
    val s2 = Seq(Date.valueOf("2024-01-15")).toDF("d")
    val wm = IncrementalMerge.watermark(Seq(s1, s2), "d").collect().head.getDate(0)
    assert(wm == Date.valueOf("2024-01-15"))
    val empty = spark.emptyDataset[Date0].toDF()
    val wm2 = IncrementalMerge.watermark(Seq(s1, empty), "d").collect().head.getDate(0)
    assert(wm2 == Date.valueOf("1900-01-01"))
  }
}

case class Date0(d: java.sql.Date)
