package graft

import java.time.Instant

import graft.operators.{Cron, TaskDag}

/** The reference's trigger surface (etl-dag.sql / ingest-dag.sql
  * `SCHEDULE = 'USING CRON … UTC'`): parse, next-fire, catch-up ticks,
  * and the coalescing scheduled runner. */
class CronSpec extends SparkTestBase {

  private def i(s: String): Instant = Instant.parse(s)

  test("Snowflake form: USING CRON 0 5 * * * UTC fires daily at 05:00Z") {
    val c = Cron.parse("USING CRON 0 5 * * * UTC")
    assert(c.next(i("2026-08-12T03:00:00Z")) == i("2026-08-12T05:00:00Z"))
    assert(c.next(i("2026-08-12T05:00:00Z")) == i("2026-08-13T05:00:00Z"),
      "next is STRICTLY after — a tick never fires twice")
    assert(c.next(i("2026-08-12T06:00:00Z")) == i("2026-08-13T05:00:00Z"))
  }

  test("steps, ranges, lists, names, month/dow boundaries") {
    val q = Cron.parse("*/15 * * * *")
    assert(q.ticksBetween(i("2026-08-12T03:00:00Z"), i("2026-08-12T04:00:00Z"))
      .map(_.toString) == Seq("2026-08-12T03:15:00Z", "2026-08-12T03:30:00Z",
        "2026-08-12T03:45:00Z", "2026-08-12T04:00:00Z"))
    // month boundary: first of month
    assert(Cron.parse("0 0 1 * *").next(i("2026-01-15T12:00:00Z"))
      == i("2026-02-01T00:00:00Z"))
    // weekday names; 2026-08-12 is a Wednesday
    assert(Cron.parse("0 9 * * MON").next(i("2026-08-12T00:00:00Z"))
      == i("2026-08-17T09:00:00Z"))
    // 0 and 7 both mean Sunday
    assert(Cron.parse("0 9 * * 7").next(i("2026-08-12T00:00:00Z"))
      == Cron.parse("0 9 * * 0").next(i("2026-08-12T00:00:00Z")))
    // ranges + lists: business hours MON-FRI on the half hour
    val bh = Cron.parse("30 9-17 * * 1-5")
    assert(bh.next(i("2026-08-14T17:30:00Z")) == i("2026-08-17T09:30:00Z"),
      "Friday 17:30 rolls to Monday 09:30")
    // month names
    assert(Cron.parse("0 0 1 JAN *").next(i("2026-03-01T00:00:00Z"))
      == i("2027-01-01T00:00:00Z"))
  }

  test("dom+dow both restricted fire on EITHER (standard cron)") {
    val c = Cron.parse("0 0 13 * FRI")
    // 2026-11-13 is a Friday; from Nov 1 the first fire is Nov 6 (a
    // Friday, dow match) — not Nov 13 (both would match)
    assert(c.next(i("2026-11-01T12:00:00Z")) == i("2026-11-06T00:00:00Z"))
    // from Nov 7: Nov 13 (dom match AND a Friday) — either rule lands there
    assert(c.next(i("2026-11-07T00:00:00Z")) == i("2026-11-13T00:00:00Z"))
    // dom-only restriction must NOT consult dow
    assert(Cron.parse("0 0 13 * *").next(i("2026-11-01T12:00:00Z"))
      == i("2026-11-13T00:00:00Z"))
  }

  test("time zones: the Snowflake trailing zone shifts fires in UTC") {
    val c = Cron.parse("0 5 * * * America/New_York")
    // winter (EST, UTC-5): 05:00 local = 10:00Z
    assert(c.next(i("2026-01-10T00:00:00Z")) == i("2026-01-10T10:00:00Z"))
    // summer (EDT, UTC-4): 05:00 local = 09:00Z
    assert(c.next(i("2026-07-10T00:00:00Z")) == i("2026-07-10T09:00:00Z"))
  }

  test("unsupported extensions and malformed fields fail loudly") {
    intercept[IllegalArgumentException](Cron.parse("0 0 L * *"))
    intercept[IllegalArgumentException](Cron.parse("0 0 * * 5#3"))
    intercept[IllegalArgumentException](Cron.parse("0 0 * *"))
    intercept[IllegalArgumentException](Cron.parse("61 0 * * *"))
  }

  test("runScheduled: coalesces missed ticks, advances the watermark, no-op when idle") {
    var runs = 0
    val tasks = Seq(TaskDag.Task("tick", run = _ => runs += 1))
    val cron = Cron.parse("0 * * * * UTC") // hourly
    // nothing due inside the hour
    assert(TaskDag.runScheduled(spark, tasks, cron,
      i("2026-08-12T03:00:00Z"), i("2026-08-12T03:59:00Z")).isEmpty)
    assert(runs == 0)
    // three ticks elapsed while suspended → ONE run, at the latest tick
    val Some((tick, results)) = TaskDag.runScheduled(spark, tasks, cron,
      i("2026-08-12T03:00:00Z"), i("2026-08-12T06:30:00Z"))
    assert(runs == 1, "missed ticks coalesce, they do not queue")
    assert(tick == i("2026-08-12T06:00:00Z"), "watermark = latest due tick")
    assert(results.forall(_.ok))
  }
}
