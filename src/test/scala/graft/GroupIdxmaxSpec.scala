package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t63 groupby idxmax/idxmin: the struct-ordered argmin/argmax device
  * against a brute-force recomputation with pandas first-occurrence
  * tie-break, plus a pinned inline tie example (the brute force only
  * exercises ties the data happens to contain; the pinned case forces
  * them). */
class GroupIdxmaxSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val ldtOrd: Ordering[java.time.LocalDateTime] =
    Ordering.by(d => (d.toLocalDate.toEpochDay, d.toLocalTime.toNanoOfDay))

  test("t63 == brute-force idxmax/idxmin with first-occurrence tie-break") {
    val rows = Tables.t(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderdate")
      .as[(Long, Long, Double, java.time.LocalDateTime)].collect()
    val expected = rows.groupBy(_._1).map { case (ck, os) =>
      val sorted = os.sortBy(_._2) // frame order = key order
      val maxP = sorted.map(_._3).max
      val minD = sorted.map(_._4).min(ldtOrd)
      ck -> (sorted.find(_._3 == maxP).get._2, maxP,
        sorted.find(_._4 == minD).get._2,
        minD, os.length.toLong)
    }
    val got = typesystem.TypeQueries.t63GroupbyIdxmax(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (ixP, mxP, ixD, mnD, n) = expected(r.getLong(0))
      assert(r.getLong(1) == ixP, s"idxmax_price for ${r.getLong(0)}")
      assert(r.getDouble(2) == mxP)
      assert(r.getLong(3) == ixD, s"idxmin_date for ${r.getLong(0)}")
      assert(r.getAs[java.time.LocalDateTime](4) == mnD)
      assert(r.getLong(5) == n)
    }
    // the tie-break must actually fire on real data: at least one group
    // holds its min date on more than one row
    val dateTies = rows.groupBy(_._1).count { case (_, os) =>
      val m = os.map(_._4).min(ldtOrd)
      os.count(_._4 == m) > 1
    }
    assert(dateTies > 0, "test data exercises no date ties — weaken alert")
  }

  test("t63 device: pinned tie example (first occurrence wins)") {
    // group 1: price tie on rows 10/30 -> idxmax = 10; date tie on all
    // three -> idxmin = 10. group 2: no ties.
    val df = Seq(
      (1L, 10L, 7.5, "2020-03-01"), (1L, 20L, 3.0, "2020-03-01"),
      (1L, 30L, 7.5, "2020-03-01"), (2L, 40L, 1.0, "2020-05-02"),
      (2L, 50L, 2.0, "2020-05-01"))
      .toDF("ck", "k", "v", "ds")
      .withColumn("d", to_date(col("ds")))
    val got = df.groupBy(col("ck"))
      .agg(max(struct(col("v").as("v"), (-col("k")).as("nk"))).as("mx"),
        min(struct(col("d").as("v"), col("k").as("k"))).as("mn"))
      .select(col("ck"), (-col("mx.nk")).as("ixp"), col("mn.k").as("ixd"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((10L, 10L)))
    assert(got(2L) == ((50L, 50L)))
  }
}
