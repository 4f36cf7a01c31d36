package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 additions: RRF hybrid fusion (s6), interval merge (q63),
  * expanding accessor (t48), C4 filters (x26) — semantics proven
  * against in-process brute-force recomputation, not just rows>0. */
class RrfIntervalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("rrfFuse: pinned example — scores, order, null partner ranks") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rk")
    val vec = Seq((20L, 1), (40L, 2)).toDF("id", "rk")
    val got = operators.Retrieval.rrfFuse(lex, vec, kRrf = 60, topK = 10)
      .orderBy("rk")
      .select("rk", "id", "rk_lex", "rk_vec", "rrf")
      .collect()
    // 20: 1/62 + 1/61 (both) > 10: 1/61 > 40: 1/62 > 30: 1/63
    assert(got.map(_.getLong(1)).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(got(0).getDouble(4) == 1.0 / 62 + 1.0 / 61)
    assert(got(1).isNullAt(3) && got(2).isNullAt(2))
  }

  test("q63 interval merge == brute-force sweep on collected events") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ss"))
      .as[(Long, Long, Long)].collect()
    val expect = rows.groupBy(_._1).map { case (uid, evs) =>
      val iv = evs.map(e => (e._3, e._3 + 60 + e._2 % 600, e._2))
        .sortBy(e => (e._1, e._3))
      // sweep: extend the open interval while start <= running max end
      var merged = List.empty[(Long, Long, Long)] // start, end, n
      for ((s0, e0, _) <- iv) merged match {
        case (ms, me, n) :: rest if s0 <= me =>
          merged = (ms, math.max(me, e0), n + 1) :: rest
        case _ => merged = (s0, e0, 1L) :: merged
      }
      uid -> ((merged.size.toLong, merged.map(m => m._2 - m._1).sum,
        merged.map(m => m._2 - m._1).max, merged.map(_._3).max))
    }
    val got = relational.Relational.q63IntervalMerge(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.length == expect.size)
    got.foreach { case (uid, nInt, covered, longest, maxMerged) =>
      val (eN, eCov, eLong, eMax) = expect(uid)
      assert((nInt, covered, longest, maxMerged) == ((eN, eCov, eLong, eMax)),
        s"user $uid")
    }
  }

  test("t48 expanding == brute-force exact moments per user") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val byUser = rows.groupBy(_._1).map { case (u, evs) =>
      u -> evs.sortBy(e => (e._2, e._3))
    }
    val got = typesystem.TypeQueries.t48Expanding(spark, sf)
      .select("user_id", "event_id", "n", "exp_mean", "exp_std")
      .collect()
    val gotByKey = got.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    byUser.foreach { case (u, evs) =>
      var sc = 0L; var scc = 0L; var n = 0L
      evs.foreach { e =>
        val cents = BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact
        sc += cents; scc += cents * cents; n += 1
        val r = gotByKey((u, e._3))
        assert(r.getLong(2) == n)
        assert(math.abs(r.getDouble(3) - sc.toDouble / n / 100.0) < 1e-12)
        if (n >= 2) {
          val v = (BigDecimal(n) * BigDecimal(scc) -
            BigDecimal(sc) * BigDecimal(sc)).toDouble / (n * (n - 1)) / 1e4
          assert(math.abs(r.getDouble(4) - math.sqrt(v)) < 1e-9)
        } else assert(r.isNullAt(4), s"std must be null at n=1 (pandas NaN)")
      }
    }
  }

  test("t61 expanding skew/kurt == brute-force exact kernels; pandas guards") {
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val byUser = rows.groupBy(_._1).map { case (u, evs) =>
      u -> evs.sortBy(e => (e._2, e._3))
    }
    val got = typesystem.TypeQueries.t61ExpandingSkewKurt(spark, sf)
      .select("user_id", "event_id", "n", "exp_skew", "exp_kurt")
      .collect()
    val gotByKey = got.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    byUser.foreach { case (u, evs) =>
      val cs = scala.collection.mutable.ArrayBuffer[BigInt]()
      evs.foreach { e =>
        cs += BigInt(BigDecimal(e._4)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
        val n = BigInt(cs.size)
        val s1 = cs.sum; val s2 = cs.map(c => c * c).sum
        val s3 = cs.map(c => c * c * c).sum; val s4 = cs.map(c => c.pow(4)).sum
        val m2 = n * s2 - s1 * s1
        val m3 = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1
        val m4 = n.pow(3) * s4 - 4 * n * n * s1 * s3 +
          6 * n * s1 * s1 * s2 - 3 * s1.pow(4)
        val r = gotByKey((u, e._3))
        val nd = n.toDouble
        if (n >= 3 && m2 > 0) {
          val ref = (math.sqrt(nd * (nd - 1)) / (nd - 2)) *
            (m3.toDouble / (m2.toDouble * math.sqrt(m2.toDouble)))
          assert(r.getDouble(3) == ref, s"skew u=$u n=$n") // bit-exact
        } else assert(r.isNullAt(3), s"skew null guard u=$u n=$n")
        if (n >= 4 && m2 > 0) {
          val ref = ((nd + 1) * (nd - 1) / ((nd - 2) * (nd - 3))) *
            (m4.toDouble / (m2.toDouble * m2.toDouble)) -
            3.0 * (nd - 1) * (nd - 1) / ((nd - 2) * (nd - 3))
          assert(r.getDouble(4) == ref, s"kurt u=$u n=$n") // bit-exact
        } else assert(r.isNullAt(4), s"kurt null guard u=$u n=$n")
      }
    }
  }

  test("Intervals.merge is associative: fold of any split == batch merge") {
    // the S16 contract, exercised across seeded random splits of a
    // fixture rich in touching/overlapping/contained intervals
    val rnd = new scala.util.Random(7)
    val iv = (0 until 120).map { i =>
      val user = i % 5L
      val ss = rnd.nextInt(500).toLong
      (user, ss, ss + 1 + rnd.nextInt(60), 1L)
    }
    def mergeDf(rows: Seq[(Long, Long, Long, Long)]) =
      operators.Intervals.merge(rows.toDF("user_id", "ss", "ee", "n"))
        .as[(Long, Long, Long, Long)].collect().toSet
    val whole = mergeDf(iv)
    for (trial <- 0 until 3) {
      val (a, b) = iv.partition(_ => rnd.nextBoolean())
      // fold: merge(A) re-entered as intervals, union B, merge again
      val foldInput = mergeDf(a).toSeq.map(m => (m._1, m._2, m._3, m._4)) ++ b
      assert(mergeDf(foldInput) == whole, s"split $trial diverged")
    }
  }

  test("t49 rolling corr: warm-up and constant windows null; values match brute") {
    val got = typesystem.TypeQueries.t49RollingCorr(spark, sf)
      .select("user_id", "event_id", "roll_cov", "roll_corr")
      .collect()
    assert(got.length > 100)
    // corr ∈ [-1, 1] (+float slop) wherever defined; cov defined from
    // the 3rd row of each user on
    val defined = got.filter(!_.isNullAt(3))
    assert(defined.nonEmpty)
    defined.foreach { r =>
      val c = r.getDouble(3)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9,
        s"corr out of range: $c @ ${r.getLong(1)}")
    }
    // brute-check a sample of rows against direct recomputation
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"),
        length(col("props")).cast("double").as("y"))
      .as[(Long, Long, Long, Double, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    val gotByKey = got.map(r => (r.getLong(0), r.getLong(1)) -> r).toMap
    rows.take(20).foreach { case (u, evs) =>
      evs.sliding(3).filter(_.length == 3).foreach { tri =>
          val Array(a, b, c0) = tri
          val (x2, x1, x) = (a._4, b._4, c0._4)
          val (y2, y1, y) = (a._5, b._5, c0._5)
          val r = gotByKey((u, c0._3))
          val cov = ((x * y + x1 * y1 + x2 * y2) -
            (x + x1 + x2) * (y + y1 + y2) / 3.0) / 2.0
          assert(math.abs(r.getDouble(2) - cov) < 1e-9, s"cov @ ${c0._3}")
          if (x == x1 && x1 == x2 || y == y1 && y1 == y2)
            assert(r.isNullAt(3), s"constant window must null corr @ ${c0._3}")
      }
    }
  }

  test("x26 C4 plants are caught: curly/lorem docs dropped, others mixed") {
    val got = llm.LlmQueries.x26C4Filters(spark, sf)
      .select("doc_id", "has_curly", "has_lorem", "doc_keep", "n_kept",
        "n_lines")
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (id, curly, lorem, keep) =
        (r.getLong(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))
      if (id % 13 == 0) assert(curly && !keep, s"doc $id: curly plant")
      if (id % 23 == 0) assert(lorem && !keep, s"doc $id: lorem plant")
      if (keep) assert(!curly && !lorem && r.getLong(4) >= 3)
      assert(r.getLong(4) <= r.getLong(5))
    }
    // the line filter must actually drop something and keep something
    val kept = got.count(_.getBoolean(3))
    assert(kept > 0 && kept < got.length)
  }
}
