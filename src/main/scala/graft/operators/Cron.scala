package graft.operators

import java.time.{Instant, ZonedDateTime, ZoneId}
import java.time.temporal.ChronoUnit

/** The reference's schedule surface (etl-dag.sql:3, ingest-dag.sql:2-3:
  * `SCHEDULE = 'USING CRON 0 5 * * * UTC'`): a 5-field cron expression
  * with an optional trailing time zone, exactly Snowflake's form.
  *
  * This closes the trigger gap the DAG alone leaves open: [[parse]] +
  * [[next]]/[[ticksBetween]] give any driver loop (or an external
  * scheduler being configured from this metadata) the fire times, and
  * [[TaskDag.runScheduled]] executes the DAG once per due tick with
  * Snowflake's no-overlap semantics (a tick that comes due while the
  * graph still runs is coalesced — Snowflake skips, it does not queue).
  *
  * Field grammar: `*`, `N`, `N-M`, `*\/S`, `N-M/S`, comma lists, and
  * JAN-DEC / SUN-SAT names; day-of-week 0 and 7 are both Sunday. When
  * BOTH day-of-month and day-of-week are restricted, a day matching
  * EITHER fires (standard cron, which Snowflake follows). `L`/`#`
  * extensions are not supported and are rejected loudly.
  */
final case class Cron(
    minutes: Set[Int],
    hours: Set[Int],
    daysOfMonth: Set[Int],
    months: Set[Int],
    daysOfWeek: Set[Int],
    zone: ZoneId,
    domRestricted: Boolean,
    dowRestricted: Boolean) {

  private def dayMatches(t: ZonedDateTime): Boolean = {
    if (!months.contains(t.getMonthValue)) return false
    val dom = daysOfMonth.contains(t.getDayOfMonth)
    val dow = daysOfWeek.contains(t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7 → 0=SUN
    if (domRestricted && dowRestricted) dom || dow
    else if (domRestricted) dom
    else if (dowRestricted) dow
    else true
  }

  /** First fire time STRICTLY after `after`, minute resolution. */
  def next(after: Instant): Instant = {
    var t = after.atZone(zone).truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
    val limit = t.plusYears(5) // '*/x' over valid fields always fires well within this
    while (t.isBefore(limit)) {
      if (!dayMatches(t))
        t = t.plusDays(1).truncatedTo(ChronoUnit.DAYS) // skip whole day
      else if (!hours.contains(t.getHour))
        t = t.plusHours(1).truncatedTo(ChronoUnit.HOURS)
      else if (!minutes.contains(t.getMinute))
        t = t.plusMinutes(1)
      else return t.toInstant
    }
    throw new IllegalStateException(s"cron never fires: $this")
  }

  /** Fire instants in `(from, to]` — what a catch-up loop owes. */
  def ticksBetween(from: Instant, to: Instant): Seq[Instant] = {
    val out = Seq.newBuilder[Instant]
    var t = next(from)
    while (!t.isAfter(to)) { out += t; t = next(t) }
    out.result()
  }
}

object Cron {

  private val MonthNames = Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
    "JUL", "AUG", "SEP", "OCT", "NOV", "DEC").zip(1 to 12).toMap
  private val DowNames = Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT")
    .zipWithIndex.toMap

  /** Accepts `"0 5 * * *"`, `"0 5 * * * UTC"`, and Snowflake's full
    * `"USING CRON 0 5 * * * UTC"`. */
  def parse(expr: String): Cron = {
    val trimmed = expr.trim.replaceAll("(?i)^USING\\s+CRON\\s+", "")
    val parts = trimmed.split("\\s+")
    require(parts.length == 5 || parts.length == 6,
      s"cron needs 5 fields + optional zone: '$expr'")
    val zone =
      if (parts.length == 6) ZoneId.of(parts(5)) else ZoneId.of("UTC")
    def field(s: String, lo: Int, hi: Int, names: Map[String, Int],
        normalize: Int => Int = identity): (Set[Int], Boolean) = {
      val up = s.toUpperCase
      require(up != "L" && !up.matches(".*\\dL.*") && !s.contains("#"),
        s"unsupported cron extension in '$s'")
      def atom(a: String): Int = names.getOrElse(a.toUpperCase,
        a.toIntOption.getOrElse(
          throw new IllegalArgumentException(s"bad cron atom '$a' in '$expr'")))
      val vals = s.split(",").toSeq.flatMap { part =>
        val (rangeStr, step) = part.split("/") match {
          case Array(r) => (r, 1)
          case Array(r, st) => (r, st.toInt)
          case _ => throw new IllegalArgumentException(s"bad cron field '$part'")
        }
        require(step >= 1, s"cron step must be >=1 in '$part'")
        val (a, b) = rangeStr match {
          case "*" => (lo, hi)
          case r if r.contains("-") =>
            val Array(x, y) = r.split("-"); (atom(x), atom(y))
          case r if step > 1 => (atom(r), hi) // "N/S" = from N by S
          case r => val v = atom(r); (v, v)
        }
        require(a >= lo && b <= hi && a <= b,
          s"cron field '$part' outside [$lo,$hi]")
        (a to b by step).map(normalize)
      }
      (vals.toSet, s != "*")
    }
    val (mins, _) = field(parts(0), 0, 59, Map.empty)
    val (hrs, _) = field(parts(1), 0, 23, Map.empty)
    val (dom, domR) = field(parts(2), 1, 31, Map.empty)
    val (mon, _) = field(parts(3), 1, 12, MonthNames)
    val (dow, dowR) = field(parts(4), 0, 7, DowNames, _ % 7) // 7 ≡ 0 ≡ SUN
    Cron(mins, hrs, dom, mon, dow, zone, domR, dowR)
  }
}
