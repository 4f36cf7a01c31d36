package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphAnnSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // two tight clusters far apart (the KnnGraphSpec corpus): ids 0-9
  // around e0, ids 10-19 around e1; tiny deterministic jitter keeps
  // vectors distinct with within-cluster cos >> cross-cluster cos
  private val dim = 8
  private def vec(axis: Int, i: Int): Array[Double] = {
    val v = Array.fill(dim)(0.001 * ((i * 7) % 5))
    v(axis) = 1.0
    v
  }
  private val rows = (0 until 10).map(i => (i.toLong, vec(0, i))) ++
    (10 until 20).map(i => (i.toLong, vec(1, i)))
  private def cosExact(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val nn = math.sqrt(na) * math.sqrt(nb)
    if (nn == 0.0) 0.0 else dot / nn
  }

  test("beam search: contract invariants + exact scoring + recall vs brute") {
    val df = rows.toDF("vec_id", "embedding")
    val queries = df.filter(col("vec_id").isin(0L, 15L))
    val k = 5
    val got = Similarity.graphTopK(df, queries, k = k,
        graphK = 3, nCells = 4, beam = 3, hops = 2)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got.nonEmpty)
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 15L))
    val vecOf = rows.toMap
    byQ.foreach { case (qid, hits) =>
      // no self; rk contiguous from 1; cos non-increasing
      assert(hits.forall(_._2 != qid))
      assert(hits.map(_._4).sorted === (1 to hits.size))
      val sorted = hits.sortBy(_._4)
      assert(sorted.map(_._3) === sorted.map(_._3).sorted.reverse)
      // every reported cos is the EXACT cosine of the pair (6 dp)
      sorted.foreach { case (q, id, c, _) =>
        val exact = math.rint(cosExact(vecOf(q), vecOf(id)) * 1e6) / 1e6
        assert(math.abs(math.rint(c * 1e6) / 1e6 - exact) < 1e-9,
          s"($q,$id): $c vs $exact")
      }
    }
    // recall vs brute ground truth on the same queries
    val brute = Similarity.bruteTopK(df, queries, k = k)
      .select("qid", "id").as[(Long, Long)].collect().toSet
    val gotPairs = got.map(h => (h._1, h._2)).toSet
    val recall = (brute & gotPairs).size.toDouble / brute.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("candidate-set dedup: a node reached via two beam parents scores once") {
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.graphTopK(df, df.filter(col("vec_id") === 0L),
        k = 20, graphK = 3, nCells = 4, beam = 3, hops = 2)
      .select("id").as[Long].collect().toSeq
    // with k > candidates, every visited node surfaces exactly once
    assert(got.distinct.size === got.size)
  }
}
