package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d17: content-defined chunking survives edits that destroy
  * fixed-width alignment — the property the operator exists for. */
class CdcChunkSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // deterministic ~600-char text (seeded LCG over a small word list)
  private val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
    "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima")
  private val s: String = {
    var x = 42L
    (0 until 100).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      words(((x >>> 33) % words.length).toInt)
    }.mkString(" ")
  }

  private def stats(rows: Seq[(Long, String)]) =
    Dedup.cdcChunkStats(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap

  test("suffix edit: all but the tail chunk still dedup") {
    val out = stats(Seq(1L -> s, 2L -> (s + " zz qq")))
    val (n1, sh1) = out(1L)
    assert(n1 >= 3, s"text too short to chunk meaningfully: $n1 chunks")
    // every chunk of doc1 except (at most) its final cut also occurs in
    // doc2 — the boundaries before the edit are content-determined
    assert(sh1 >= n1 - 1, s"expected >=${n1 - 1} shared, got $sh1")
  }

  test("prefix insertion: CDC re-aligns, fixed-width chunking loses everything") {
    val shifted = "inserted prefix " + s
    val out = stats(Seq(1L -> s, 2L -> shifted))
    val (n1, sh1) = out(1L)
    // boundaries shift in POSITION but not in content, so most chunks
    // re-align (the first chunk, and possibly its neighbor, differ)
    assert(sh1 >= n1 / 2, s"CDC lost alignment: $sh1 of $n1 shared")
    // contrast: fixed 64-char slices of the same pair share NOTHING
    val fixedShared = s.grouped(64).toSet
      .intersect(shifted.grouped(64).toSet)
    assert(fixedShared.isEmpty, "fixed-width unexpectedly aligned")
  }

  test("unrelated docs share no chunks; short doc yields one whole-doc chunk") {
    val other = words.reverse.mkString(" ") * 4
    val out = stats(Seq(1L -> s, 2L -> other, 3L -> "tiny"))
    assert(out(1L)._2 == 0L && out(2L)._2 == 0L)
    assert(out(3L) == ((1L, 0L))) // len < window: one chunk, unshared
  }
}
