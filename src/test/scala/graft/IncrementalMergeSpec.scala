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
