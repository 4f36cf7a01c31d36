package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

class KnnGraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("planted clusters: mutual edges stay in-cluster; output invariants hold") {
    // two tight clusters far apart in direction; ids 0-9 around e1,
    // ids 10-19 around e2 (tiny deterministic jitter keeps vectors
    // distinct but within-cluster cosine >> cross-cluster cosine)
    val dim = 8
    def vec(axis: Int, i: Int): Array[Double] = {
      val v = Array.fill(dim)(0.001 * ((i * 7) % 5))
      v(axis) = 1.0
      v
    }
    val rows = (0 until 10).map(i => (i.toLong, vec(0, i))) ++
      (10 until 20).map(i => (i.toLong, vec(1, i)))
    val df = rows.toDF("vec_id", "embedding")
    val edges = Similarity.knnGraph(df, "vec_id", "embedding",
        k = 3, nCells = 2)
      .as[(Long, Long, Double, Int, Int)].collect().toSeq
    assert(edges.nonEmpty)
    edges.foreach { case (a, b, cos, rkAb, rkBa) =>
      assert(a < b)
      assert(rkAb >= 1 && rkAb <= 3 && rkBa >= 1 && rkBa <= 3)
      assert(cos <= 1.000001)
      // no cross-cluster mutual edge survives
      assert((a < 10) == (b < 10), s"cross-cluster edge ($a,$b)")
    }
    // each unordered pair appears exactly once
    assert(edges.map(e => (e._1, e._2)).distinct.size == edges.size)
  }
}
