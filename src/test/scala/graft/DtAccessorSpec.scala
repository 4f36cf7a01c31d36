package graft

import java.time.LocalDate
import java.time.temporal.IsoFields

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t64 .dt accessor: every getter differentially tested against
  * java.time over the whole orders table, plus pinned ISO-week edge
  * dates (Jan-1 belonging to the PREVIOUS iso year, week-53 years,
  * century non-leap) the table's 1992-1998 span cannot contain. */
class DtAccessorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def checkRows(rows: Array[org.apache.spark.sql.Row]): Unit =
    rows.foreach { r =>
      val d = r.getDate(1).toLocalDate
      def ix(i: Int) = r.getInt(i)
      assert(ix(2) == d.getYear, s"y @ $d")
      assert(ix(3) == (d.getMonthValue - 1) / 3 + 1, s"q @ $d")
      assert(ix(4) == d.getMonthValue, s"m @ $d")
      assert(ix(5) == d.getDayOfMonth, s"dom @ $d")
      assert(ix(6) == d.getDayOfWeek.getValue - 1, s"dow_mon @ $d")
      assert(ix(7) == d.getDayOfYear, s"doy @ $d")
      assert(ix(8) == d.get(IsoFields.WEEK_BASED_YEAR), s"iso_year @ $d")
      assert(ix(9) == d.get(IsoFields.WEEK_OF_WEEK_BASED_YEAR), s"iso_week @ $d")
      assert(ix(10) == d.lengthOfMonth, s"days_in_month @ $d")
      assert(r.getBoolean(11) == d.isLeapYear, s"is_leap_year @ $d")
      assert(r.getBoolean(12) == (d.getDayOfMonth == d.lengthOfMonth),
        s"is_month_end @ $d")
      assert(r.getBoolean(13) == (d.getDayOfMonth == d.lengthOfMonth &&
        Set(3, 6, 9, 12)(d.getMonthValue)), s"is_quarter_end @ $d")
    }

  test("t64 == java.time over the whole orders table") {
    val got = typesystem.TypeQueries.t64DtAccessor(spark, sf).collect()
    assert(got.nonEmpty)
    checkRows(got)
  }

  test("t64 getters on pinned ISO-week edge dates") {
    // 2021-01-01..03 = ISO week 53 of 2020; 2021-01-04 = week 1;
    // 2015-12-28 and 2016-01-03 = week 53 of 2015; 1992-12-28 opens
    // week 53 of 1992 (inside the data's span); 2000-02-29 leap
    // century; 2100-02-28 non-leap century; 1969-12-29 = week 1 of
    // 1970 (negative ordinal, pmod path); 1977-01-02 = week 53 of 1976.
    val edges = Seq("2021-01-01", "2021-01-02", "2021-01-03", "2021-01-04",
      "2015-12-28", "2016-01-03", "1992-12-28", "2000-02-29", "2000-12-31",
      "2100-02-28", "2100-03-01", "1969-12-29", "1969-12-28", "1977-01-02",
      "1996-02-29", "1993-09-30", "1993-12-31")
    val df = edges.zipWithIndex
      .map { case (s, i) => (i.toLong, java.sql.Date.valueOf(s)) }
      .toDF("orderkey", "d")
    checkRows(typesystem.TypeQueries.dtAccessorColumns(df).collect())
  }
}
