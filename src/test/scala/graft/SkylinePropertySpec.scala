package graft

import graft.operators.Skyline
import org.scalatest.funsuite.AnyFunSuite

/** Randomized differential tests: the two-pass skyline (partition-local
  * prune + global window scan) vs brute-force dominance over seeded
  * random point sets — the property the q65 oracle checks on one
  * dataset, here across many shapes (duplicates, ties on each axis,
  * multiple groups, adversarial collinear runs). */
class SkylinePropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def brute(pts: Seq[(String, Double, Long)])
      : Set[(String, Double, Long)] = {
    val d = pts.distinct
    d.filter { a =>
      !d.exists(b => b._1 == a._1 && b._2 <= a._2 && b._3 >= a._3 &&
        (b._2 < a._2 || b._3 > a._3))
    }.toSet
  }

  private def run(pts: Seq[(String, Double, Long)])
      : Set[(String, Double, Long)] = {
    val d = pts.groupBy(identity).map { case (k, vs) =>
      (k._1, k._2, k._3, vs.size.toLong, 1L)
    }.toSeq.toDF("g", "x", "y", "n", "rep")
    Skyline.skyline(d, "g", "x", "y", "n", "rep")
      .select("g", "x", "y")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
  }

  test("random point clouds: two-pass scan == brute dominance (5 seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new scala.util.Random(seed)
      // small value ranges force duplicates and axis ties
      val pts = Seq.fill(120)((s"g${rnd.nextInt(3)}",
        (rnd.nextInt(12) + 1).toDouble, rnd.nextInt(12).toLong))
      assert(run(pts) == brute(pts), s"seed $seed diverged")
    }
  }

  test("adversarial shapes: collinear runs, single points, total order") {
    // vertical run (same x): only the max-y survives
    val vert = (1 to 6).map(i => ("v", 5.0, i.toLong))
    assert(run(vert) == Set(("v", 5.0, 6L)))
    // horizontal run (same y): only the min-x survives
    val horiz = (1 to 6).map(i => ("h", i.toDouble, 5L))
    assert(run(horiz) == Set(("h", 1.0, 5L)))
    // anti-chain (x and y both increasing): everything survives
    val anti = (1 to 6).map(i => ("a", i.toDouble, i.toLong))
    assert(run(anti) == anti.toSet)
    // chain (x increasing, y decreasing): only the first survives
    val chain = (1 to 6).map(i => ("c", i.toDouble, (10 - i).toLong))
    assert(run(chain) == Set(("c", 1.0, 9L)))
  }
}
