package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline verdict semantics on planted docs: each drop reason fires
  * on its own construction, precedence resolves multi-signal docs, and
  * clean docs keep. */
class CurationSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // long-enough English-ish filler that passes quality + length
  private def good(seed: Int): String =
    (0 until 60).map(i => s"the quick word$seed$i and of to in is that it for").mkString(" ")

  test("each drop reason fires; precedence dup > contaminated > quality > length") {
    val eval = Seq((900L, good(7))).toDF("doc_id", "text")
    val docs = Seq(
      0L -> good(1),        // clean → keep
      1L -> good(2),        // original of the dup pair → keep
      2L -> good(2),        // exact copy → dup
      3L -> good(7),        // matches eval doc → contaminated
      4L -> "12 34 " * 250, // zero alpha, zero stopwords → low_quality
      5L -> ("the and of to in is that it for " * 300) // > 2000 tokens but fine quality → length
    ).toDF("doc_id", "text")

    val out = Curation.curate(docs, eval, "doc_id", "text")
      .select("id", "keep", "drop_reason")
      .as[(Long, Boolean, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    assert(out(0L) == ((true, None)))
    assert(out(1L) == ((true, None)))
    assert(out(2L) == ((false, Some("dup"))))
    assert(out(3L) == ((false, Some("contaminated"))))
    assert(out(4L) == ((false, Some("low_quality"))))
    assert(out(5L) == ((false, Some("length"))))

    // precedence: a doc that is BOTH dup and contaminated reports dup
    val docs2 = docs.union(Seq(6L -> good(7)).toDF("doc_id", "text"))
    val out2 = Curation.curate(docs2, eval, "doc_id", "text")
      .select("id", "drop_reason").as[(Long, Option[String])].collect().toMap
    assert(out2(3L) == Some("contaminated")) // first occurrence: not a dup
    assert(out2(6L) == Some("dup"))          // copy of 3 → dup wins
  }
}
