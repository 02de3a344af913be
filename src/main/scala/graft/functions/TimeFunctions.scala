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
    * `c` — micros precision preserved. Field extractions on NTZ are
    * wall-clock-pure; the explicit 'UTC' argument keeps the rebuild
    * out of the session zone entirely. */
  def ntzWallClockAsUtc(c: Column): Column =
    call_function("make_timestamp",
      year(c), month(c), dayofmonth(c), hour(c), minute(c),
      second(c) + date_format(c, "SSSSSS").cast("decimal(16,6)") /
        lit(1000000),
      lit("UTC"))

  /** The instant at UTC midnight of DATE `c` — dates are zone-less,
    * so "the date's epoch second" must not depend on where the
    * driver happens to run. */
  def dateAsUtcMidnight(c: Column): Column =
    timestamp_seconds(
      datediff(c, lit("1970-01-01").cast("date")).cast("long") * 86400L)
}
