package graft

import graft.operators.Clustering
import org.scalatest.funsuite.AnyFunSuite

/** Lloyd k-means semantics on planted geometry: well-separated groups
  * must land in the same cluster as their own members, never with
  * another group's, and determinism must hold across reruns. */
class KMeansSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 3 tight blobs at distance-2√2-separated orthogonal corners: blob g
  // lives on axes (2g, 2g+1) at 2.0 ± a per-point 0.01 jitter
  private def blobs: Seq[(Long, Array[Float])] =
    for (g <- 0 until 3; p <- 0 until 10) yield {
      val v = Array.fill(8)(0.0f)
      v(2 * g) = 2.0f + 0.01f * p
      v(2 * g + 1) = 2.0f - 0.01f * p
      ((g * 10 + p).toLong, v)
    }

  test("well-separated blobs are never split across clusters") {
    val df = blobs.toDF("id", "vec")
    val out = Clustering.kmeansAssign(df, "id", "vec", k = 3, iters = 4)
      .as[(Long, Int, Double)].collect()
    assert(out.length == 30)
    val byGroup = out.groupBy(_._1 / 10).view.mapValues(_.map(_._2).distinct)
    byGroup.foreach { case (g, cls) =>
      assert(cls.length == 1, s"blob $g split across clusters $cls")
    }
    // 3 blobs → 3 distinct cluster ids, and intra-blob distance is tiny
    assert(byGroup.values.flatten.toSet.size == 3)
    assert(out.forall(_._3 < 0.5), "every point near its own centroid")
  }

  test("e12 ARI: real structure survives an init nudge (blobs ARI = 1)") {
    val df = blobs.toDF("id", "vec")
    def labels(salt: String): Map[Long, Int] =
      Clustering.kmeansAssign(df, "id", "vec", k = 3, iters = 3,
          initSalt = salt)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (la, lb) = (labels(""), labels("b"))
    // pair-counting ARI in-process
    val ids = blobs.map(_._1)
    val pairs = for (i <- ids; j <- ids if i < j) yield (i, j)
    val (both, aOnly, bOnly) = pairs.foldLeft((0L, 0L, 0L)) {
      case ((s, a, b), (i, j)) =>
        val sa = la(i) == la(j); val sb = lb(i) == lb(j)
        (s + (if (sa && sb) 1 else 0), a + (if (sa) 1 else 0),
          b + (if (sb) 1 else 0))
    }
    val n = pairs.size.toLong
    val exp = aOnly.toDouble * bOnly.toDouble / n
    val ari = (both - exp) / ((aOnly + bOnly) / 2.0 - exp)
    // the planted blobs are genuine structure: a different init sample
    // must recover the identical partition (up to label names)
    assert(ari > 0.999, s"blob ARI $ari — structure lost under init nudge")
  }

  test("assignment is deterministic across reruns") {
    val df = blobs.toDF("id", "vec")
    val a = Clustering.kmeansAssign(df, "id", "vec", k = 3, iters = 2)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    val b = Clustering.kmeansAssign(df, "id", "vec", k = 3, iters = 2)
      .as[(Long, Int, Double)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("silhouette: tight separated blobs score near 1; range is [-1, 1]") {
    val df = blobs.toDF("id", "vec")
    val sil = Clustering.silhouetteSimplified(df, "id", "vec",
        k = 3, iters = 2)
      .as[(Long, Long, Double)].collect()
    // every blob member sits ~0.01 from its own centroid and ~2√2 from
    // the others → simplified silhouette ≈ 1 for every cluster
    assert(sil.length == 3)
    assert(sil.map(_._2).sum == 30)
    sil.foreach { case (c, n, s) =>
      assert(s >= -1.0 && s <= 1.0, s"cluster $c out of range: $s")
      assert(s > 0.95, s"cluster $c should be near-perfect, got $s")
    }
    // a deliberately over-split k (6 > 3 true blobs) must score lower
    // somewhere: splitting a tight blob puts its halves' centroids
    // closer to each other than the blob radius
    val over = Clustering.silhouetteSimplified(df, "id", "vec",
        k = 6, iters = 2)
      .as[(Long, Long, Double)].collect()
    assert(over.map(_._3).min < sil.map(_._3).min,
      "over-clustering should hurt the worst cluster's silhouette")
  }

  test("kCenterCoreset picks the square's corners, never the clustered mass") {
    // 4 corners of a 10×10 square + a 20-point cloud hugging corner 0:
    // mass-weighted sampling would drown in the cloud; farthest-point
    // traversal must walk the corners — seed 0 (min id), then the
    // diagonal (id 2), then the 100-tied corners 1 before 3 (id
    // tie-break), radii √200 → 10 → 10; the census sends the cloud to
    // corner 0
    val corners = Seq(
      0L -> Array(0f, 0f), 1L -> Array(10f, 0f),
      2L -> Array(10f, 10f), 3L -> Array(0f, 10f))
    val cloud = (4 until 24).map(i =>
      i.toLong -> Array(0.01f * (i % 5), 0.01f * (i % 7)))
    val df = (corners ++ cloud).toDF("id", "vec")
    val got = graft.operators.Clustering
      .kCenterCoreset(df, "id", "vec", k = 4)
      .as[(Long, Long, Option[Double], Long)].collect().toSeq
    assert(got.map(_._2) == Seq(0L, 2L, 1L, 3L), s"selection order: $got")
    assert(got.head._3.isEmpty, "seed has no radius")
    assert(math.abs(got(1)._3.get - math.sqrt(200.0)) < 1e-6)
    assert(math.abs(got(2)._3.get - 10.0) < 1e-6)
    assert(math.abs(got(3)._3.get - 10.0) < 1e-6)
    assert(got.find(_._2 == 0L).get._4 == 21L, // corner 0 + its cloud
      s"census: $got")
  }
}
