package graft

import graft.operators.Graphs
import org.scalatest.funsuite.AnyFunSuite

class GraphsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 1 → 2 → 3 → 4 → 5 chain, plus a shortcut 1 → 4 and an island 9 → 10.
  private val edges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L), (9L, 10L),
  ).toDF("src", "dst")

  test("bfs assigns minimum hop distance (shortcut wins over chain)") {
    val d = Graphs.bfs(edges, Seq(1L).toDF("node"), maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
  }

  test("bfs respects the hop bound and excludes unreachable nodes") {
    val d = Graphs.bfs(edges, Seq(1L).toDF("node"), maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
    assert(!d.contains(9L) && !d.contains(10L))
  }

  test("bfs from multiple seeds takes the nearest seed's distance") {
    val d = Graphs.bfs(edges, Seq(1L, 9L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(d(10L) == 1L && d(3L) == 2L && d(9L) == 0L)
  }

  test("graphProfile: hand-computed triangle+pendant; regular-graph null guard") {
    // K3 on {1,2,3} plus pendant edge (3,4): degrees 2,2,3,1
    // W = 1+1+3+0 = 5, T = 1, C = 3/5
    // directed moments: M=8, Σx=18, Σx²=44, Σxy=38
    //   r = (8·38−18²)/(8·44−18²) = −20/28
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val r = Graphs.graphProfile(g).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((4L, 4L, 5L, 1L)))
    assert(r.getDouble(4) == 3.0 / 5.0)
    assert(r.getDouble(5) == -20.0 / 28.0)
    // K3 alone: regular graph — assortativity denominator is exactly 0
    // → null (the integer guard); clustering = 3·1/3 = 1
    val k3 = Graphs.graphProfile(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")).collect().head
    assert(k3.getDouble(4) == 1.0 && k3.isNullAt(5))
  }

  test("graphProfile reusing a precomputed triangleCounts equals self-computed") {
    // triangle + pendant + a second triangle sharing node 3, plus the
    // island edge — enough structure that a wrong 3T would shift both
    // n_triangles and clustering
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (3L, 5L),
      (4L, 5L), (9L, 10L)).toDF("src", "dst")
    val tri = Graphs.triangleCounts(g)
    val reused = Graphs.graphProfile(g, Some(tri)).collect().head
    val self = Graphs.graphProfile(g).collect().head
    assert(reused == self)
    // and the counts the caller already holds are the q61 answer —
    // the shared pass serves both registry entries from one close
    assert(tri.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("pageRank ranks sum to ~1 and sinks hold the base rank") {
    val r = Graphs.pageRank(edges, iters = 3).as[(Long, Double)]
      .collect().toMap
    assert(r.size == 7)
    // dangling mass is dropped (simplified PR), so the total is < 1
    // but every node holds at least the (1-d)/N floor
    val floor = 0.15 / 7
    assert(r.values.forall(_ >= floor - 1e-8)) // 9-dp output rounding
    // node 4 has two in-links (3→4, 1→4), node 2 only one (1→2) of
    // equal source rank/degree — 4 must outrank 2
    assert(r(4L) > r(2L))
    // island source 9 receives nothing: exactly the floor
    assert(math.abs(r(9L) - floor) < 1e-9)
  }

  test("pageRank small (driver-vector) and large (distributed) regimes agree exactly") {
    val small = Graphs.pageRank(edges, iters = 3).as[(Long, Double)]
      .collect().toMap
    val large = Graphs.pageRank(edges, iters = 3, broadcastNodes = 0L)
      .as[(Long, Double)].collect().toMap
    assert(small == large) // bit-identical, not approximately equal
  }
}
