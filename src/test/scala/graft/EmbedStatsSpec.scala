package graft

import graft.operators.EmbedStats
import org.scalatest.funsuite.AnyFunSuite

/** dimCovariance on planted geometry: known variances, a perfectly
  * correlated pair, and an independent-by-construction pair. */
class EmbedStatsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("covariance matrix recovers planted variance/correlation structure") {
    // dim0 = ±1 alternating (var 1); dim1 = 2·dim0 (cov 2, var 4);
    // dim2 = ±1 at half frequency — orthogonal to dim0 over the cycle
    // (cov 0); dim3 = constant (var 0, cov 0 with everything)
    val rows = (0 until 400).map { r =>
      val s0 = if (r % 2 == 0) 1.0f else -1.0f
      val s2 = if ((r / 2) % 2 == 0) 1.0f else -1.0f
      (r.toLong, Array(s0, 2.0f * s0, s2, 7.0f))
    }
    val cov = EmbedStats.dimCovariance(rows.toDF("id", "vec"), "vec", dim = 4)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap

    assert(cov.size == 10) // 4·5/2 upper-triangular entries
    assert(cov((0, 0)) == 1.0)  // var(±1) = 1
    assert(cov((1, 1)) == 4.0)  // var(±2) = 4
    assert(cov((0, 1)) == 2.0)  // perfectly correlated pair
    assert(cov((0, 2)) == 0.0)  // orthogonal by construction
    assert(cov((3, 3)) == 0.0)  // constant dim: zero variance
    assert(cov((0, 3)) == 0.0 && cov((1, 3)) == 0.0 && cov((2, 3)) == 0.0)
  }

  test("effective rank: closed forms on planted isotropic / collinear geometry") {
    // two balanced orthogonal axes, mean 0: C = diag(.5,.5,0,0)
    // → tr 1, ‖C‖²_F .5 → eff_rank EXACTLY 2
    val two = (0 until 40).map { r =>
      val v = Array(0.0f, 0.0f, 0.0f, 0.0f)
      v(r % 2) = if ((r / 2) % 2 == 0) 1.0f else -1.0f
      (r.toLong, v)
    }
    val g2 = EmbedStats.effectiveRank(two.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(g2.getAs[Int]("n_dims") == 4)
    assert(g2.getAs[Long]("tr_e6") == 1000000L)
    assert(g2.getAs[Long]("fro2_e12") == 500000000000L)
    assert(g2.getAs[Double]("eff_rank") == 2.0)
    assert(g2.getAs[Double]("eff_rank_frac") == 0.5)
    // everything on one axis: rank-1 spectrum → eff_rank EXACTLY 1;
    // a correlated copy on another axis must NOT raise it (off-diag
    // mass counts): dim1 = dim0 → C = [[1,1],[1,1],..] → er = 4/4 = 1
    val one = (0 until 40).map { r =>
      val s = if (r % 2 == 0) 1.0f else -1.0f
      (r.toLong, Array(s, s, 0.0f, 0.0f))
    }
    val g1 = EmbedStats.effectiveRank(one.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(g1.getAs[Double]("eff_rank") == 1.0)
    // degenerate all-zero corpus: guarded NULL, not a division blowup
    val zero = (0 until 8).map(r => (r.toLong, Array(0.0f, 0.0f, 0.0f, 0.0f)))
    val gz = EmbedStats.effectiveRank(zero.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(gz.isNullAt(gz.fieldIndex("eff_rank")))
  }

  test("anisotropy: closed forms on axis-vector geometry") {
    // axis vectors have EXACT grid unit components (û = 10⁶·e_k), so
    // every closed form below is exact, not approximate.
    // (a) n copies of one axis → every pairwise cosine 1
    val same = (0 until 6).map(r => (r.toLong, Array(3.0f, 0.0f, 0.0f, 0.0f)))
    val a = EmbedStats.anisotropy(same.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(a.getAs[Long]("n_used") == 6L)
    assert(a.getAs[Double]("mean_norm") == 3.0)
    assert(a.getAs[Double]("mean_cos") == 1.0)
    // (b) two orthogonal axes → cosine 0
    val orth = Seq((0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 2.0f, 0f, 0f)))
    val b = EmbedStats.anisotropy(orth.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(b.getAs[Double]("mean_cos") == 0.0)
    assert(b.getAs[Double]("mean_norm") == 1.5)
    // (c) opposite vectors → −1
    val opp = Seq((0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(-1.0f, 0f, 0f, 0f)))
    val c = EmbedStats.anisotropy(opp.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(c.getAs[Double]("mean_cos") == -1.0)
    // (d) e0, e0, e1: ordered pairs 6, two with cos 1 → mean 1/3
    // (‖Σû‖² = 5e12, Σ‖û‖² = 3e12 → 2e12 / 6e12 exactly, rendered @6)
    val mix = Seq((0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(1.0f, 0f, 0f, 0f)),
      (2L, Array(0f, 1.0f, 0f, 0f)))
    val d = EmbedStats.anisotropy(mix.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(d.getAs[Double]("mean_cos") == 0.333333)
    // (e) zero vectors are excluded, not poison; n=1 → NULL mean_cos
    val zeros = Seq((0L, Array(1.0f, 0f, 0f, 0f)), (1L, Array(0f, 0f, 0f, 0f)))
    val e = EmbedStats.anisotropy(zeros.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(e.getAs[Long]("n_used") == 1L)
    assert(e.isNullAt(e.fieldIndex("mean_cos")))
    // (f) semigroup: a 2-way moment split folds to the batch answer
    val all = same ++ orth.map { case (i, v) => (i + 100L, v) }
    val m1 = EmbedStats.anisotropyMoments(
      same.toDF("id", "vec"), "vec", dim = 4)
    val m2 = EmbedStats.anisotropyMoments(
      orth.map { case (i, v) => (i + 100L, v) }.toDF("id", "vec"), "vec", 4)
    val folded = EmbedStats.anisotropyFromMoments(
      EmbedStats.mergeAnisotropyMoments(m1.unionByName(m2), 4), 4)
      .collect().head
    val batch = EmbedStats.anisotropy(all.toDF("id", "vec"), "vec", dim = 4)
      .collect().head
    assert(folded.toSeq == batch.toSeq)
  }

  test("pcaPowerProject recovers a planted dominant direction") {
    // dim0 carries a large-variance signal t; dim1 = t/2 (same
    // direction); dims 2..15 carry a tiny ±0.001 dither. The top PC
    // must align with (2,1)/√5 in the (dim0,dim1) plane → p1 strongly
    // correlated with t; λ1 ≫ λ2.
    val rows = (0 until 300).map { r =>
      val t = (r % 100 - 50) / 100.0f // in [-0.5, 0.5), var ≈ 0.083
      val dither = (d: Int) => if ((r + d) % 2 == 0) 0.001f else -0.001f
      (r.toLong, s"g${r % 3}",
        Array(2.0f * t, t) ++ Array.tabulate(14)(d => dither(d)))
    }
    val out = EmbedStats.pcaPowerProject(
        rows.toDF("vec_id", "label", "embedding"),
        Seq("vec_id"), "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(3)))
    val lam1 = out.head._3
    // correlation of p1 with the planted t
    val ts = out.map { case (id, _, _) => (id % 100 - 50) / 100.0 }
    val ps = out.map(_._2)
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length.toDouble
      val (ma, mb) = (a.sum / n, b.sum / n)
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum / n
      cov / math.sqrt(a.map(x => (x - ma) * (x - ma)).sum / n *
        (b.map(y => (y - mb) * (y - mb)).sum / n))
    }
    assert(math.abs(corr(ps, ts)) > 0.999)
    val lam2 = EmbedStats.pcaPowerProject(
        rows.toDF("vec_id", "label", "embedding"), Seq("vec_id"), "embedding")
      .head().getDouble(4)
    assert(lam1 > 0.05 && lam1 > 100 * math.abs(lam2))
  }

  test("embedDrift: planted magnitude shift reads cos 1, l2 = shift²") {
    import org.apache.spark.sql.functions.{col, lit}
    def v(x: Float): Array[Float] = x +: Array.fill(63)(0.0f)
    // label 0: slice A at 1·e1, slice B at 2·e1 → mean gap 1, cos 1
    // label 1: identical slices → zero drift
    val rows = Seq(
      (0L, 0, v(1.0f)), (2L, 0, v(1.0f)), (1L, 0, v(2.0f)), (3L, 0, v(2.0f)),
      (4L, 1, v(3.0f)), (6L, 1, v(3.0f)), (5L, 1, v(3.0f)), (7L, 1, v(3.0f)))
    val out = EmbedStats.embedDrift(
        rows.toDF("vec_id", "label", "embedding"), "label", "embedding",
        col("vec_id") % 2 === 0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out("0") == ((2L, 2L, 1.0, 1.0)))
    assert(out("1") == ((2L, 2L, 0.0, 1.0)))
  }

  test("pcaExplainedVariance: planted 1-D signal puts ~all variance in pc1") {
    // same geometry as the projection test: one dominant direction in
    // the (dim0, dim1) plane, dither elsewhere → pc1 share ≈ 1
    val rows = (0 until 300).map { r =>
      val t = (r % 100 - 50) / 100.0f
      val dither = (d: Int) => if ((r + d) % 2 == 0) 0.001f else -0.001f
      (r.toLong, Array(2.0f * t, t) ++ Array.tabulate(14)(d => dither(d)))
    }
    val out = EmbedStats.pcaExplainedVariance(
        rows.toDF("vec_id", "embedding"), "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out.keySet == Set("pc1", "pc2", "residual"))
    val (lam1, share1, cum1) = out("pc1")
    assert(lam1 > 0.05 && share1 > 0.999 && cum1 == share1)
    assert(out("pc2")._2 < 1e-3 && out("residual")._2 < 1e-3)
    assert(out("residual")._3 == 1.0)
    // shares decompose the trace: pc1 + pc2 + residual ≈ 1
    assert(math.abs(share1 + out("pc2")._2 + out("residual")._2 - 1.0) < 1e-12)
  }
}
