package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins Spark's native session_window boundary semantics (exact-gap
  * event: merged or new session?) so the q51 oracle mirrors the real
  * rule rather than an assumed one. */
class SessionWindowSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("exact-gap event semantics + session bounds") {
    // events at t=0s, t=1800s (exactly the gap), t=5000s
    val df = Seq(0L, 1800L, 5000L)
      .toDF("es").select(timestamp_seconds($"es").as("ts"))
    val got = df
      .groupBy(session_window($"ts", "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp($"sw.start").as("start_s"),
        unix_timestamp($"sw.end").as("end_s"), $"n")
      .orderBy("start_s")
      .as[(Long, Long, Long)].collect().toSeq
    // document the observed rule in the assertion itself
    assert(got == Seq((0L, 3600L, 2L), (5000L, 6800L, 1L)),
      s"session_window semantics changed: $got")
  }
}
