package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t65 Series.autocorr: brute-force BigInt replay of the Pearson
  * kernels over the collected daily series (positional shift, aligned
  * pairs, exact-integer variance guards), bit-exact doubles included —
  * BigInteger.doubleValue is the same correctly-rounded narrowing as
  * Spark's Decimal cast. Plus a pinned constant-series null case. */
class AutocorrSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def autocorr(xs: Seq[Long], lagK: Int): (Long, Option[Double]) = {
    val pairs = xs.drop(lagK).zip(xs.dropRight(lagK))
      .map { case (x, y) => (BigInt(x), BigInt(y)) }
    val n = BigInt(pairs.length)
    val sx = pairs.map(_._1).sum; val sy = pairs.map(_._2).sum
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val num = n * sxy - sx * sy
    val dx = n * sxx - sx * sx
    val dy = n * syy - sy * sy
    val r = if (pairs.length >= 2 && dx > 0 && dy > 0)
      Some(num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
    else None
    (pairs.length.toLong, r)
  }

  test("t65 == BigInt Pearson replay of the positional-shift series") {
    val daily = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        (Tables.dec(col("value")) * lit(100)).cast("long").as("c"))
      .groupBy("user_id", "day").agg(sum("c").as("x"))
      .select("user_id", "day", "x")
      .as[(Long, java.sql.Date, Long)].collect()
    val series = daily.groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toLocalDate.toEpochDay).map(_._3).toSeq).toMap
    val got = typesystem.TypeQueries.t65Autocorr(spark, sf).collect()
    assert(got.length == series.size && got.nonEmpty)
    var live1 = 0; var live7 = 0
    got.foreach { r =>
      val xs = series(r.getLong(0))
      assert(r.getLong(1) == xs.length.toLong)
      val (n1, a1) = autocorr(xs, 1)
      val (n7, a7) = autocorr(xs, 7)
      assert(r.getLong(2) == n1)
      assert((if (r.isNullAt(3)) None else Some(r.getDouble(3))) == a1,
        s"autocorr_1 @ user ${r.getLong(0)}")
      assert(r.getLong(4) == n7)
      assert((if (r.isNullAt(5)) None else Some(r.getDouble(5))) == a7,
        s"autocorr_7 @ user ${r.getLong(0)}")
      if (a1.isDefined) live1 += 1
      if (a7.isDefined) live7 += 1
    }
    assert(live1 > 0 && live7 > 0, "both lags must be live at this SF")
  }

  test("t65 device: constant series yields null (exact-zero variance)") {
    val xs = Seq(5L, 5L, 5L, 5L, 5L)
    assert(autocorr(xs, 1) == ((4L, None)))
    // and a hand-checked tiny case: perfect positive shift correlation
    val ys = Seq(1L, 2L, 3L, 4L)
    val (n, r) = autocorr(ys, 1)
    assert(n == 3L && math.abs(r.get - 1.0) < 1e-15)
  }
}
