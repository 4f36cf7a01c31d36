package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proves the Bench artifact's failure-marker path on a FORCED failure
  * (no committed artifact has ever exercised it): min-over-successes
  * per query, crash timings excluded from the headline total, and the
  * failed_any / failed_all distinction. */
class BenchFoldSpec extends AnyFunSuite {

  private val names = Seq("qa", "qb", "qc")

  test("all passes green: per-query min, total = sum of mins") {
    val raw = Seq(
      Seq("qa" -> (2.0, true), "qb" -> (5.0, true), "qc" -> (1.0, true)),
      Seq("qa" -> (3.0, true), "qb" -> (4.0, true), "qc" -> (9.0, true)))
    val f = Bench.fold(names, raw)
    assert(f.results.toMap === Map("qa" -> 2.0, "qb" -> 4.0, "qc" -> 1.0))
    assert(f.total === 7.0)
    assert(f.failedAny.isEmpty && f.failedAll.isEmpty)
    // spread = max - min over the same passes the min came from
    assert(f.spread.toMap === Map("qa" -> 1.0, "qb" -> 1.0, "qc" -> 8.0))
  }

  test("one failing pass: min over SUCCESSFUL passes only, named in failedAny") {
    // qb crashes fast (0.1 s) in pass 1 — min-of-N must NOT let the
    // crash time masquerade as the query's honest cost
    val raw = Seq(
      Seq("qa" -> (2.0, true), "qb" -> (0.1, false), "qc" -> (1.0, true)),
      Seq("qa" -> (3.0, true), "qb" -> (6.0, true), "qc" -> (2.0, true)))
    val f = Bench.fold(names, raw)
    assert(f.results.toMap.apply("qb") === 6.0)
    assert(f.total === 2.0 + 6.0 + 1.0)
    assert(f.failedAny === Seq("qb"))
    assert(f.failedAll.isEmpty)
    // qb's crash pass is excluded from the spread window too: one
    // successful pass -> spread 0, never (6.0 - 0.1)
    assert(f.spread.toMap.apply("qb") === 0.0)
    assert(f.spread.toMap.apply("qa") === 1.0)
  }

  test("all passes failed: visible in map, EXCLUDED from total, named in failedAll") {
    val raw = Seq(
      Seq("qa" -> (2.0, true), "qb" -> (0.3, false), "qc" -> (1.0, true)),
      Seq("qa" -> (3.0, true), "qb" -> (0.2, false), "qc" -> (2.0, true)))
    val f = Bench.fold(names, raw)
    // the fastest failing time stays VISIBLE in the per-query map...
    assert(f.results.toMap.apply("qb") === 0.2)
    // ...but the headline total cannot blend a crash timing in
    assert(f.total === 2.0 + 1.0)
    assert(f.failedAny === Seq("qb"))
    assert(f.failedAll === Seq("qb"))
    // zero successful passes: spread falls back to the failing times
    // (visible like the min itself)
    assert(math.abs(f.spread.toMap.apply("qb") - 0.1) < 1e-12)
  }

  test("single pass, single query, failed: total is zero, not the crash time") {
    val raw = Seq(Seq("qa" -> (0.5, false)))
    val f = Bench.fold(Seq("qa"), raw)
    assert(f.results.toMap.apply("qa") === 0.5)
    assert(f.total === 0.0)
    assert(f.failedAll === Seq("qa"))
  }
}
