package graft

import graft.expressions.{TopKAgg, TopKBuffer}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Direct coverage for the mergeable bounded-heap top-k aggregate —
  * the ANN reduce-side machinery (Similarity.topK) whose only other
  * proof is s1's end-to-end oracle hash. */
class TopKAggSpec extends AnyFunSuite {
  import TestSpark._

  private def agg(k: Int) =
    TopKAgg(Literal(0.0), Literal(0L), k)

  private def expectedTopK(rows: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }.take(k)

  test("buffer keeps exactly the top k under (score desc, id asc)") {
    val rnd = new Random(7)
    val rows = Seq.tabulate(500)(i => (rnd.nextInt(50).toDouble, i.toLong))
    val b = new TopKBuffer(10)
    rows.foreach { case (s, i) => b.add(s, i) }
    assert(b.sorted.toSeq == expectedTopK(rows, 10))
  }

  test("tie-break: equal scores rank by id ascending") {
    val b = new TopKBuffer(3)
    Seq(5L, 1L, 9L, 3L, 7L).foreach(id => b.add(1.0, id))
    assert(b.sorted.toSeq == Seq((1.0, 1L), (1.0, 3L), (1.0, 5L)))
  }

  test("k = 1 keeps the single best; k > n returns all n in order") {
    val rows = Seq((0.3, 3L), (0.9, 1L), (0.9, 0L), (0.1, 2L))
    val b1 = new TopKBuffer(1)
    rows.foreach { case (s, i) => b1.add(s, i) }
    assert(b1.sorted.toSeq == Seq((0.9, 0L)))
    val b9 = new TopKBuffer(9)
    rows.foreach { case (s, i) => b9.add(s, i) }
    assert(b9.sorted.toSeq == expectedTopK(rows, 9))
    assert(b9.n == 4)
  }

  test("NaN scores rank first (Double.compare total order), never dropped") {
    val b = new TopKBuffer(3)
    b.add(0.5, 1L); b.add(Double.NaN, 2L); b.add(0.9, 3L)
    b.add(Double.PositiveInfinity, 4L); b.add(Double.NaN, 0L)
    val got = b.sorted
    assert(got.length == 3)
    assert(got(0)._1.isNaN && got(0)._2 == 0L)
    assert(got(1)._1.isNaN && got(1)._2 == 2L)
    assert(got(2) == (Double.PositiveInfinity, 4L))
  }

  test("serialize/deserialize round-trips a partial buffer") {
    val a = agg(5)
    val rnd = new Random(11)
    val b = new TopKBuffer(5)
    Seq.tabulate(40)(i => (rnd.nextDouble(), i.toLong))
      .foreach { case (s, i) => b.add(s, i) }
    val back = a.deserialize(a.serialize(b))
    assert(back.k == b.k && back.n == b.n)
    assert(back.sorted.toSeq == b.sorted.toSeq)
    // empty buffer round-trips too
    val e = a.deserialize(a.serialize(new TopKBuffer(5)))
    assert(e.n == 0 && e.k == 5)
  }

  test("merge of partial buffers equals single-buffer result") {
    val rnd = new Random(13)
    val rows = Seq.tabulate(1000)(i => (rnd.nextInt(100).toDouble, i.toLong))
    val single = new TopKBuffer(16)
    rows.foreach { case (s, i) => single.add(s, i) }
    // 16 partials merged pairwise in arbitrary order
    val partials = rows.grouped(63).map { chunk =>
      val p = new TopKBuffer(16)
      chunk.foreach { case (s, i) => p.add(s, i) }
      p
    }.toSeq
    val merged = Random.shuffle(partials).reduce(_.merge(_))
    assert(merged.sorted.toSeq == single.sorted.toSeq)
  }

  test("16-partition DataFrame aggregation equals 1-partition result") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val rnd = new Random(17)
    val rows = Seq.tabulate(2000)(i =>
      (i % 7, rnd.nextInt(40).toDouble, i.toLong))
    def run(nPart: Int) =
      rows.toDF("g", "score", "id").repartition(nPart)
        .groupBy("g")
        .agg(expr("graft_top_k(score, id, 5)").as("hits"))
        .orderBy("g")
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[org.apache.spark.sql.Row](1)
          .map(h => (h.getLong(0), h.getDouble(1))))
        .toSeq
    val got16 = run(16)
    assert(got16 == run(1))
    // and both equal the Scala-side reference answer per group
    val want = rows.groupBy(_._1).view.mapValues(g =>
      expectedTopK(g.map(t => (t._2, t._3)), 5).map { case (s, i) => (i, s) })
    got16.foreach { case (g, hits) => assert(hits == want(g), s"group $g") }
  }

  test("analyzer coerces INT score / INT id instead of runtime CCE") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val got = Seq((3, 30), (9, 10), (5, 20)).toDF("score", "id")
      .agg(expr("graft_top_k(score, id, 2)").as("hits"))
      .selectExpr("inline(hits)")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((10L, 9.0), (20L, 5.0)))
  }

  test("output field is named score") {
    GraftExtensions.register(spark)
    import spark.implicits._
    val schema = Seq((1.0, 1L)).toDF("s", "i")
      .agg(expr("graft_top_k(s, i, 3)").as("hits")).schema
    val elem = schema("hits").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("id", "score"))
  }
}
