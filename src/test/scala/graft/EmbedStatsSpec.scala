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
}
