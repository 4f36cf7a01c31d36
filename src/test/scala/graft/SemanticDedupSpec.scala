package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemDeDup semantics: exact vector copies always share a cell with
  * their original (identical argmin) and score cos = 1; orthogonal
  * vectors never pair; of each duplicate group the smallest id is the
  * kept representative and every later member points at it. */
class SemanticDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // orthogonal basis vectors → zero cosine across distinct seeds
  private def basis(seed: Int, dim: Int = 16): Array[Float] = {
    val v = Array.fill(dim)(0.0f); v(seed % dim) = 1.0f; v
  }

  test("exact copies dedup to smallest id; orthogonal vectors never pair") {
    // 8 orthogonal originals 0..7; copies of vec 2 at ids 100 and 200;
    // a scaled copy (same direction, different norm) of vec 5 at id 300
    val rows = (0 until 8).map(i => (i.toLong, basis(i))) ++ Seq(
      (100L, basis(2)), (200L, basis(2)),
      (300L, basis(5).map(_ * 3.0f)))
    val df = rows.toDF("id", "vec")

    val out = Dedup.semanticDedup(df, "id", "vec", nCells = 4, threshold = 0.95)
      .select("id", "is_dup", "dup_of")
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(out.keySet == rows.map(_._1).toSet) // every input id verdict'd
    (0 until 8).foreach(i => assert(out(i.toLong) == ((false, None)),
      s"original $i must be kept"))
    assert(out(100L) == ((true, Some(2L))))  // copy → smallest id
    assert(out(200L) == ((true, Some(2L))))  // not 100: min id wins
    assert(out(300L) == ((true, Some(5L))))  // cosine is norm-invariant
  }

  test("threshold cuts: near-but-not-identical directions below it stay") {
    // id 10 = vec 1 tilted 45° toward vec 3 → cos(10, 1) ≈ 0.707 < 0.95
    val tilt = Array.fill(16)(0.0f); tilt(1) = 1.0f; tilt(3) = 1.0f
    val df = ((0 until 8).map(i => (i.toLong, basis(i))) :+ (10L, tilt))
      .toDF("id", "vec")
    val out = Dedup.semanticDedup(df, "id", "vec", nCells = 2, threshold = 0.95)
      .filter(col("is_dup")).count()
    assert(out == 0L)
  }
}
