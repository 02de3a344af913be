package graft

import java.sql.Date
import org.apache.spark.sql.functions._
import graft.operators.PanelAsOf

class PanelAsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("events get the max panel monday whose window covers their date") {
    val mondays = Seq(Date.valueOf("2024-01-08"), Date.valueOf("2024-01-15"))
      .toDF("panel_monday")
    val windows = PanelAsOf.windows(mondays)
    val events = Seq(
      (1L, Date.valueOf("2024-01-05")), // covered by both → max = 01-15
      (2L, Date.valueOf("2024-01-14")), // only 01-15 window ends 01-14
      (3L, Date.valueOf("2024-01-20"))  // covered by none → null
    ).toDF("id", "d")
    val out = PanelAsOf.assign(events, windows, "d")
      .select("id", "panel_monday").as[(Long, Option[Date])].collect().toMap
    assert(out(1L).contains(Date.valueOf("2024-01-15")))
    assert(out(2L).contains(Date.valueOf("2024-01-15")))
    assert(out(3L).isEmpty)
  }

  test("window bounds are [monday-28, monday-1]") {
    val w = PanelAsOf.windows(Seq(Date.valueOf("2024-01-29")).toDF("panel_monday"))
      .collect().head
    assert(w.getAs[Date]("window_start") == Date.valueOf("2024-01-01"))
    assert(w.getAs[Date]("window_end") == Date.valueOf("2024-01-28"))
  }

  test("assignment plan broadcasts the date map (no fact-side shuffle)") {
    val mondays = Seq(Date.valueOf("2024-01-08")).toDF("panel_monday")
    val events = Seq((1L, Date.valueOf("2024-01-05"))).toDF("id", "d")
    val plan = PanelAsOf.assign(events, PanelAsOf.windows(mondays), "d")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
