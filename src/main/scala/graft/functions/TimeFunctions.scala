package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Session-timezone-independent time interpretation.
  *
  * The engine's contract for zone-less inputs is "the wall clock IS
  * UTC". The tempting implementation — convert_timezone into the
  * session zone, then cast — round-trips through a LOCAL zone, and
  * local zones are not injective: during a DST fall-back overlap the
  * same wall clock names two instants and the cast must guess,
  * shifting affected rows by the DST delta. These helpers rebuild
  * the instant FIELD-WISE with an explicit 'UTC' zone instead
  * (`make_timestamp(..., 'UTC')`), so no local-zone guess ever
  * happens and the result is identical under any session timezone.
  */
object TimeFunctions {

  /** The instant whose UTC wall clock equals the TIMESTAMP_NTZ value
    * `c` — micros precision preserved. Pure epoch ARITHMETIC over
    * wall-clock-pure field extractions (date days + time-of-day
    * micros, `date_part('SECOND')` carries the fraction as an exact
    * decimal): no formatter, no per-row calendar rebuild, no zone
    * lookup — this runs on every scan of the event feed, so it must
    * cost like arithmetic, not like `date_format` (a first cut
    * through make_timestamp + date_format showed up as a 1.5-2×
    * regression across every events-reading query in the bench). */
  def ntzWallClockAsUtc(c: Column): Column =
    timestamp_micros(
      unix_date(c.cast("date")).cast("long") * lit(86400000000L) +
        hour(c).cast("long") * lit(3600000000L) +
        minute(c).cast("long") * lit(60000000L) +
        (call_function("date_part", lit("SECOND"), c) *
          lit(1000000)).cast("long"))

  /** The instant at UTC midnight of DATE `c` — dates are zone-less,
    * so "the date's epoch second" must not depend on where the
    * driver happens to run. */
  def dateAsUtcMidnight(c: Column): Column =
    timestamp_seconds(
      datediff(c, lit("1970-01-01").cast("date")).cast("long") * 86400L)
}
