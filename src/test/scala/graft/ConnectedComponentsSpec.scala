package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Duplicate-cluster resolution: hash-min + pointer-jump connected
  * components over a pair graph (Dedup.connectedComponents). */
class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** Reference union-find, driver-side. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(v => v -> find(v)).toMap
  }

  test("path graph collapses to its min vertex (log-round convergence)") {
    // a 200-vertex path is the worst case for plain propagation
    // (O(diameter) = 200 rounds); pointer jumping must close it well
    // inside the default maxIter = 25 ≈ log2 bound + slack
    val path = (0L until 199L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.size == 200)
    assert(got.values.forall(_ == 0L))
  }

  test("disjoint cliques keep distinct min labels") {
    val cl1 = for { i <- 10L to 14L; j <- (i + 1) to 14L } yield (i, j)
    val cl2 = for { i <- 20L to 22L; j <- (i + 1) to 22L } yield (i, j)
    val got = cc(cl1 ++ cl2)
    assert((10L to 14L).forall(got(_) == 10L))
    assert((20L to 22L).forall(got(_) == 20L))
  }

  test("random graphs match driver-side union-find") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val pairs = Seq.fill(n) {
        val a = rnd.nextInt(60).toLong; val b = rnd.nextInt(60).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      assert(cc(pairs) == unionFind(pairs), s"trial $trial")
    }
  }

  test("empty pair set yields empty labels") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Dedup.connectedComponents(empty, "a", "b").isEmpty)
  }

  test("dupClusters sizes and keep flags") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("a", "b")
    val got = Dedup.dupClusters(pairs, "a", "b")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(got == Set((1L, 1L, 3L, true), (2L, 1L, 3L, false),
      (3L, 1L, 3L, false), (7L, 7L, 2L, true), (8L, 7L, 2L, false)))
  }
}
