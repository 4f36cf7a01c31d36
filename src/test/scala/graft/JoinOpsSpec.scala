package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.scalatest.funsuite.AnyFunSuite

class JoinOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val quotes = Seq( // (sym, t, px)
    ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
    ("B", 15L, 9.0),
  ).toDF("sym", "qt", "px")
  private val trades = Seq( // (sym, t, qty)
    ("A", 5L, 100L), // before any quote → null
    ("A", 20L, 200L), // exact tie → inclusive match at 20
    ("A", 25L, 300L), // → quote at 20
    ("A", 99L, 400L), // → quote at 30
    ("B", 16L, 500L), // → quote at 15
    ("C", 50L, 600L), // no quotes for key → null
  ).toDF("sym", "tt", "qty")

  test("asof join: latest at-or-before per key, inclusive ties, left-outer") {
    val got = AsOfJoin.asof(trades, quotes, Seq("sym"), "tt", "qt",
        rightVals = Seq("px", "qt"))
      .orderBy("sym", "tt")
      .select("sym", "tt", "qty", "r_px")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toSeq
    assert(got == Seq(
      ("A", 5L, None), ("A", 20L, Some(2.0)), ("A", 25L, Some(2.0)),
      ("A", 99L, Some(3.0)), ("B", 16L, Some(9.0)), ("C", 50L, None)))
  }

  test("asof join: right duplicates resolved by tie-break (later wins)") {
    val dupQuotes = Seq(("A", 10L, 1.0, 1L), ("A", 10L, 7.0, 2L))
      .toDF("sym", "qt", "px", "seq")
    val got = AsOfJoin.asof(Seq(("A", 11L)).toDF("sym", "tt"), dupQuotes,
        Seq("sym"), "tt", "qt", rightVals = Seq("px"),
        rightTieBreak = Some("seq"))
      .select("r_px").as[Double].head()
    assert(got == 7.0)
  }

  test("range join: pairs within window only, boundary inclusive") {
    val l = Seq(("u", 1L, 100L), ("u", 2L, 500L)).toDF("k", "lid", "lt")
    val r = Seq(("u", 10L, 40L), ("u", 11L, 160L), ("u", 12L, 161L),
      ("u", 13L, 440L)).toDF("k", "rid", "rt")
    val got = RangeJoin.within(l, r, Seq("k"), "lt", "rt", 60L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    // lt=100 matches rt∈[40,160]; rt=161 is out (|100-161|=61)
    // lt=500 matches rt=440 (|500-440|=60, inclusive)
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 13L)))
  }
}
