package graft

import graft.operators.BpeTrainer
import org.scalatest.funsuite.AnyFunSuite

/** fitLocal ≡ fit: the driver-local incremental merge loop must be
  * merge-for-merge AND vocabulary-row equal to the distributed
  * job-per-merge fit — that equality is what lets the registry (x20/
  * x23/x36) run the local path against the unchanged SQL oracle. */
class BpeTrainerSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def vocabRows(df: org.apache.spark.sql.DataFrame) =
    df.select("word", "cnt", "n_tokens", "tokens")
      .as[(String, Long, Int, String)].collect().sortBy(_._1).toSeq

  private def assertEqualFits(docs: org.apache.spark.sql.DataFrame,
      nMerges: Int): Unit = {
    val (dv, dm) = BpeTrainer.fit(docs, "text", nMerges)
    val (lv, lm) = BpeTrainer.fitLocal(docs, "text", nMerges)
    assert(lm == dm, "merge lists diverge")
    assert(vocabRows(lv) == vocabRows(dv), "tokenized vocab diverges")
  }

  test("local fit equals distributed fit on a run/tie/unicode corpus") {
    // runs ("aaaaa": the leftmost-replace boundary rule), count ties
    // (utf8 tie-break), combining accents and a supplementary-plane
    // char (UTF-8 vs UTF-16 ordering, surrogate-safe splitting)
    val docs = Seq(
      (1L, "aaaaa aaaa aab banana bandana"),
      (2L, "née née née résumé 𝕊ab 𝕊ab zz zz yy yy"),
      (3L, "mississippi bookkeeper aab aaaaa"),
      (4L, "xy xy xz xz") // (x,y) vs (x,z) tie at equal counts
    ).toDF("doc_id", "text")
    assertEqualFits(docs, 12)
  }

  test("both paths stop early when pairs are exhausted") {
    val docs = Seq((1L, "ab ab cd e")).toDF("doc_id", "text")
    val (_, dm) = BpeTrainer.fit(docs, "text", nMerges = 50)
    val (lv, lm) = BpeTrainer.fitLocal(docs, "text", nMerges = 50)
    assert(dm == lm)
    assert(lm.map(m => (m._2, m._3, m._4)) ==
      Seq(("a", "b", 2L), ("c", "d", 1L)))
    // every word fully merged to one token
    assert(lv.select("n_tokens").as[Int].collect().forall(_ == 1))
  }

  test("local fit equals distributed fit on the sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    assertEqualFits(docs, 8)
  }

  test("vocab cap falls back to the distributed path") {
    val docs = Seq((1L, "aaaaa aaaa aab")).toDF("doc_id", "text")
    val (dv, dm) = BpeTrainer.fit(docs, "text", 5)
    val (lv, lm) = BpeTrainer.fitLocal(docs, "text", 5, maxLocalVocab = 1L)
    assert(lm == dm && vocabRows(lv) == vocabRows(dv))
  }

  test("a pair can win twice across rounds (boundary-rule leftovers)") {
    // one word "aaaa" ×3: round 1 merges the leading (a,a) only
    // (boundary rule) leaving [aa,a,a]; (a,a) count drops 9→3, ties
    // (aa,a) at 3, and wins the utf8 tie-break ("a" < "aa") → [aa,aa]
    val docs = Seq((1L, "aaaa aaaa aaaa b")).toDF("doc_id", "text")
    val (_, dm) = BpeTrainer.fit(docs, "text", 2)
    val (lv, lm) = BpeTrainer.fitLocal(docs, "text", 2)
    assert(lm == dm)
    assert(lm.map(m => (m._2, m._3, m._4)) ==
      Seq(("a", "a", 9L), ("a", "a", 3L)))
    assert(lv.filter($"word" === "aaaa").select("tokens").as[String]
      .head() == "aa aa")
  }
}
