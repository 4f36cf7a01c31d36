package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/calendar kernels re-expressing bertrand/util/time (epoch.pyx,
  * unit.pyx, calendar.pyx, timezone.py) as Column expressions. */
object TimeFns {

  /** Microseconds per unit (reference util/time/unit.pyx `as_ns` table,
    * scaled to Spark's native microsecond timestamps). Calendar units
    * (M/Y) are handled separately — they are not fixed-width. */
  def unitMicros(unit: String): Long = unit match {
    case "us" | "microsecond" | "microseconds" => 1L
    case "ms" | "millisecond" | "milliseconds" => 1000L
    case "s" | "sec" | "second" | "seconds" => 1000000L
    case "m" | "min" | "minute" | "minutes" => 60L * 1000000L
    case "h" | "hour" | "hours" => 3600L * 1000000L
    case "D" | "d" | "day" | "days" => 86400L * 1000000L
    case "W" | "w" | "week" | "weeks" => 7L * 86400L * 1000000L
    case other => throw new IllegalArgumentException(s"unknown unit: $other")
  }

  /** Exact whole-unit difference between two timestamps (floor).
    * Inputs are cast to TIMESTAMP — parquet NTZ columns are accepted
    * (session timezone is UTC everywhere in graft). */
  def diff(a: Column, end: Column, unit: String): Column =
    floor((unix_micros(end.cast("timestamp")) - unix_micros(a.cast("timestamp"))) /
      lit(unitMicros(unit))).cast("long")

  /** Leap-year predicate (reference util/time/calendar.pyx
    * `is_leap_year`): Gregorian rule, pure integer arithmetic. */
  def isLeapYear(y: Column): Column =
    (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)

  /** Days in the month of a date (reference calendar.pyx
    * `days_in_month`). */
  def daysInMonth(d: Column): Column = dayofmonth(last_day(d))

  /** ISO day-of-week with Sunday=0 (engine-neutral convention used by
    * the oracle; Spark's dayofweek is 1-based Sunday). */
  def dowSunday0(d: Column): Column = dayofweek(d) - 1

  /** Interpret a naive timestamp as wall-clock time in `tz` and convert
    * to the absolute UTC instant (reference timezone.py `localize`). */
  def localize(tsCol: Column, tz: String): Column = to_utc_timestamp(tsCol, tz)

  /** Render a UTC instant as wall-clock time in `tz` (reference
    * timezone.py conversion; naive result, like tz_convert + tz-strip). */
  def toWallClock(tsCol: Column, tz: String): Column = from_utc_timestamp(tsCol, tz)
}
