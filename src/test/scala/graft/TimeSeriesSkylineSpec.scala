package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: skyline / Pareto frontier (q65), time-weighted
  * average (q66), OHLC resample bars (t53) — semantics proven against
  * in-process brute-force recomputation on the shared test tables. */
class TimeSeriesSkylineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("q65 skyline == brute-force dominance filter, local prune lossless") {
    val d = Tables.t(spark, sf, "part")
      .groupBy(col("p_brand"), col("p_retailprice").as("price"),
        col("p_size").cast("long").as("size"))
      .agg(count(lit(1)).as("n"), min("p_partkey").as("rep"))
      .as[(String, Double, Long, Long, Long)].collect()
    val expect = d.filter { a =>
      !d.exists(b => b._1 == a._1 && b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.map(r => (r._1, r._2, r._3, r._4, r._5)).toSet
    val got = relational.Relational.q65Skyline(spark, sf)
      .as[(String, Double, Long, Long, Long)].collect().toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(3)} extra=${(got -- expect).take(3)}")
  }

  test("q65 frontier property: per brand, no survivor dominates another") {
    val got = relational.Relational.q65Skyline(spark, sf)
      .as[(String, Double, Long, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (_, rows) =>
      // on a (min-price, max-size) frontier, price and size strictly
      // increase together: a pricier point with ≤ size would be
      // dominated by the cheaper one, an equal-price pair by its
      // larger-size member
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._2 < b._2 && a._3 < b._3, s"non-frontier pair $a $b")
        case _ =>
      }
    }
  }

  test("q66 TWAP == brute-force duration-weighted mean (exact cents×µs)") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val expect = evs.groupBy(_._1).flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val held = sorted.dropRight(1).zip(sorted.drop(1)).map {
        case (a, b) => (BigInt(math.round(a._4 * 100)), BigInt(b._2 - a._2))
      }
      if (held.isEmpty) None
      else {
        val num = held.map { case (c, w) => c * w }.sum
        val den = held.map(_._2).sum
        // the pinned 10⁻⁶-dollar grid: floor((Σcents·µs · 10⁴) / Σµs),
        // then ONE IEEE division — must reproduce the query EXACTLY
        val e6 = (num * 10000) / den
        Some(uid -> ((e6, e6.toDouble / 1e6, den.toLong, held.size.toLong)))
      }
    }
    val got = relational.Relational.q66Twap(spark, sf)
      .select("user_id", "twap_e6", "twap", "held_us", "n_held")
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (uid, e6, twap, heldUs, n) =>
      val (ee6, etwap, eheld, en) = expect(uid)
      assert(heldUs == eheld && n == en, s"user $uid weights")
      assert(BigInt(e6) == ee6, s"user $uid twap_e6 $e6 != $ee6")
      assert(twap == etwap, s"user $uid twap $twap != $etwap")
    }
  }

  test("t53 OHLC == brute-force per (user, day) bars") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .as[(Long, Long, Long, Long, Double)].collect()
    val expect = evs.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
      val sorted = rs.sortBy(r => (r._3, r._4))
      k -> ((sorted.head._5, rs.map(_._5).max, rs.map(_._5).min,
        sorted.last._5,
        rs.map(r => math.round(r._5 * 100)).sum / 100.0, rs.size.toLong))
    }
    val got = typesystem.TypeQueries.t53ResampleOhlc(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double, Double, Long)]
      .collect()
    assert(got.length == expect.size)
    got.foreach { case (uid, day, o, h, l, c, v, n) =>
      val (eo, eh, el, ec, ev, en) = expect((uid, day))
      assert(o == eo && h == eh && l == el && c == ec && n == en,
        s"bar ($uid, $day)")
      assert(math.abs(v - ev) < 1e-9, s"volume ($uid, $day)")
    }
  }
}
