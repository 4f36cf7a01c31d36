package graft

import graft.expressions.{FreqItemsAgg, MGBuffer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FreqItemsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def agg(col: org.apache.spark.sql.Column, k: Int, n: Int) = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(FreqItemsAgg(
      ColumnBridge.expression(col), k, n).toAggregateExpression())
  }

  test("exact mode: capacity >= distinct, 16 partitions == GROUP BY truth") {
    // zipf-ish: item i appears (50 - i) times
    val rows = (0 until 40).flatMap(i => Seq.fill(50 - i)(f"tok$i%02d"))
    val df = rows.toDF("item").repartition(16)
    val got = df.agg(agg($"item", k = 64, n = 10).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect().toSeq
    val expect = (0 until 10).map(i => (f"tok$i%02d", (50 - i).toLong))
    assert(got == expect)
  }

  test("tie order is (cnt desc, item asc); output truncates to n") {
    val rows = Seq("b", "b", "a", "a", "c")
    val got = rows.toDF("item").agg(agg($"item", 8, 2).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 2L), ("b", 2L)))
  }

  test("adversarial: sub-capacity summary keeps the n/(k+1) bound and never overcounts") {
    // 200 distinct light items + 3 genuinely heavy ones, capacity 16
    val heavy = Seq.fill(400)("H1") ++ Seq.fill(300)("H2") ++ Seq.fill(200)("H3")
    val light = (0 until 200).flatMap(i => Seq.fill(3)(s"l$i"))
    val all = new scala.util.Random(42).shuffle((heavy ++ light).toList) // bound holds for any order; seed for reproducibility
    val n = all.size
    val k = 16
    val truth = all.groupBy(identity).map { case (s, v) => s -> v.size.toLong }
    val got = all.toDF("item").repartition(8)
      .agg(agg($"item", k, 32).as("hh"))
      .select(explode($"hh").as("e")).select($"e.item", $"e.cnt")
      .as[(String, Long)].collect()
    got.foreach { case (item, est) =>
      assert(est <= truth(item), s"$item overcounted: $est > ${truth(item)}")
      assert(est >= truth(item) - n / (k + 1).toLong,
        s"$item undercounted beyond bound: $est vs ${truth(item)} (n=$n k=$k)")
    }
    // every item above the guarantee threshold must be reported
    val reported = got.map(_._1).toSet
    truth.filter(_._2 > n / (k + 1)).keys.foreach { h =>
      assert(reported.contains(h), s"heavy item $h missing")
    }
  }

  test("serialize/deserialize round-trips the summary") {
    val b = new MGBuffer(4)
    Seq("x", "x", "y", "z", "z", "z").foreach(b.add)
    val a = FreqItemsAgg(null, 4, 4)
    val back = a.deserialize(a.serialize(b))
    assert(back.k == 4)
    assert(back.top(4).toSeq == b.top(4).toSeq)
  }

  test("callable from SQL as graft_freq_items") {
    GraftExtensions.register(spark)
    Seq("a", "a", "b").toDF("t").createOrReplaceTempView("fi_t")
    val r = spark.sql(
      "SELECT graft_freq_items(t, 8, 1) AS hh FROM fi_t").collect()
    assert(r.head.getSeq[org.apache.spark.sql.Row](0).head.getString(0) == "a")
  }
}
