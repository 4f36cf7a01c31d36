package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mortonRef(a: Int, b: Int): Long = {
    def spread(x: Int): Long =
      (0 until 16).map(i => ((x >> i) & 1).toLong << (2 * i)).sum
    spread(a & 0xFFFF) | (spread(b & 0xFFFF) << 1)
  }

  test("zvalue2 matches the bit-by-bit Morton reference") {
    val cases = Seq((0, 0), (1, 0), (0, 1), (65535, 65535),
      (12345, 54321), (40000, 7), (255, 256))
    val got = cases.toDF("a", "b")
      .select(ZOrder.zvalue2(col("a"), col("b")).as("z"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((a, b), z) =>
      assert(z == mortonRef(a, b), s"($a, $b)")
    }
  }

  test("z-order buckets prune a rectangle better than a 1-D sort") {
    // orders clustered on (custkey, order-day); rectangle = one
    // customer band × one date band. A custkey-sorted layout has tight
    // custkey stats but FULL-RANGE date stats per file (and vice
    // versa); z-buckets are tight on both, so fewer buckets intersect.
    val o = Tables.t(spark, sf, "orders").select(
      (col("o_custkey") % 65536).cast("long").as("a"),
      (datediff(col("o_orderdate"), to_date(lit("1970-01-01"))) % 65536)
        .cast("long").as("b"))
      .persist()
    val nB = 64
    val zStats = ZOrder.layoutStats(o, col("a"), col("b"), 6).collect()
    assert(zStats.map(_.getAs[Long]("n_rows")).sum == o.count())
    // 1-D layout twin: 64 equal-frequency custkey files
    val oneD = o.withColumn("f", ntile(nB).over(
        org.apache.spark.sql.expressions.Window.orderBy("a")))
      .groupBy("f").agg(min("a").as("a_min"), max("a").as("a_max"),
        min("b").as("b_min"), max("b").as("b_max")).collect()
    // rectangle = a 20% customer band × a 10% date band of the actual
    // data extent (scale-independent)
    val ext = o.agg(min("a"), max("a"), min("b"), max("b")).head()
    val (aMn, aMx, bMn, bMx) =
      (ext.getLong(0), ext.getLong(1), ext.getLong(2), ext.getLong(3))
    val (aLo, aHi) = (aMn + (aMx - aMn) / 10, aMn + 3 * (aMx - aMn) / 10)
    val (bLo, bHi) = (bMn + (bMx - bMn) / 10, bMn + 2 * (bMx - bMn) / 10)
    def hits(rows: Array[org.apache.spark.sql.Row]): Int = rows.count { r =>
      r.getAs[Long]("a_max") >= aLo && r.getAs[Long]("a_min") <= aHi &&
      r.getAs[Long]("b_max") >= bLo && r.getAs[Long]("b_min") <= bHi
    }
    val (zHits, dHits) = (hits(zStats), hits(oneD))
    o.unpersist()
    assert(zHits < dHits,
      s"z-order should prune harder: z=$zHits of ${zStats.length}, " +
        s"1-D=$dHits of ${oneD.length}")
  }
}
