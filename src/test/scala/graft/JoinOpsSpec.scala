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

  test("asofDirected: forward, nearest (tie → backward), and tolerance") {
    def run(d: String, tol: Option[Long] = None) =
      AsOfJoin.asofDirected(trades, quotes, Seq("sym"), "tt", "qt",
          rightVals = Seq("px"), direction = d, tolerance = tol)
        .orderBy("sym", "tt")
        .collect()
        .map(r => ((r.getAs[String]("sym"), r.getAs[Long]("tt")),
          Option(r.getAs[java.lang.Double]("r_px")).map(_.toDouble)))
        .toMap
    val fwd = run("forward")
    assert(fwd(("A", 5L)) == Some(1.0))    // earliest quote ≥ 5 is t=10
    assert(fwd(("A", 20L)) == Some(2.0))   // inclusive tie at 20
    assert(fwd(("A", 25L)) == Some(3.0))   // next quote at 30
    assert(fwd(("A", 99L)) == None)        // nothing after 30
    assert(fwd(("C", 50L)) == None)
    val near = run("nearest")
    assert(near(("A", 5L)) == Some(1.0))   // only forward exists
    assert(near(("A", 25L)) == Some(2.0))  // |25-20| = |25-30| → backward wins
    assert(near(("A", 99L)) == Some(3.0))  // only backward exists
    assert(near(("C", 50L)) == None)
    val backTol = run("backward", tol = Some(10L))
    assert(backTol(("A", 25L)) == Some(2.0))  // Δ=5 within 10
    assert(backTol(("A", 99L)) == None)       // Δ=69 beyond tolerance
    val nearTol = run("nearest", tol = Some(5L))
    assert(nearTol(("A", 25L)) == Some(2.0))  // backward Δ=5 ok, forward Δ=5 ok → backward
    assert(nearTol(("A", 99L)) == None)       // both out of tolerance
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

  test("native as-of exec matches the composition operator exactly") {
    val viaComposition = AsOfJoin.asof(trades, quotes, Seq("sym"), "tt", "qt",
        rightVals = Seq("px", "qt"))
      .orderBy("sym", "tt").collect().map(_.toString).toSeq
    val viaNative = graft.plans.AsOfJoinNative.asof(trades, quotes,
        Seq("sym"), "tt", "qt", rightVals = Seq("px", "qt"))
      .orderBy("sym", "tt").collect().map(_.toString).toSeq
    assert(viaNative == viaComposition)
  }

  test("native as-of exec plan contains AsOfJoinExec, no window") {
    val plan = graft.plans.AsOfJoinNative.asof(trades, quotes,
        Seq("sym"), "tt", "qt", rightVals = Seq("px"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window"))
  }

  test("native as-of on real events equals composition on real events") {
    val e = Tables.events(spark, sf).selectExpr("event_id", "user_id",
      "unix_timestamp(ts) AS es", "event_type", "value")
    val p = e.filter($"event_type" === "purchase").select("event_id", "user_id", "es")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id", $"es".as("v_es"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"event_id", $"value")).as("m"))
      .select($"user_id", $"v_es", $"m.event_id".as("v_id"), $"m.value".as("v_value"))
    val a = AsOfJoin.asof(p, v, Seq("user_id"), "es", "v_es",
        Seq("v_id", "v_value", "v_es"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    val b = graft.plans.AsOfJoinNative.asof(p, v, Seq("user_id"), "es", "v_es",
        Seq("v_id", "v_value", "v_es"))
      .orderBy("event_id").collect().map(_.toString).toSeq
    assert(a == b && a.nonEmpty)
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

  test("fuzzyHammingJoin finds exactly the hamming<=2 pairs") {
    val a = Seq((1L, "abcdefghijkl"), (2L, "zzzzzzzzzzzz"))
      .toDF("a_id", "a_name")
    val b = Seq(
      (10L, "abXdefghijkl"), // dist 1 of a1
      (11L, "abXdeYghijkl"), // dist 2 of a1
      (12L, "aXcXeXghijkl"), // dist 3 of a1 → excluded
      (13L, "zzzzzzzzzzzY"), // dist 1 of a2
      (14L, "bcdefghijklm")  // a1 shifted (edit-distance 2 but hamming 12)
    ).toDF("b_id", "b_name")
    val got = graft.operators.Dedup
      .fuzzyHammingJoin(a, b, "a_id", "a_name", "b_id", "b_name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 10L, 1), (1L, 11L, 2), (2L, 13L, 1)))
  }
}
