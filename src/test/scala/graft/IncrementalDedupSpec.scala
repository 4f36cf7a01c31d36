package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test: the incremental (index-join) dedup verdict must
  * equal the ground truth derived from the FULL minhashPairs run over
  * corpus ∪ batch — same pairs, same smallest-id dup_of, same jaccard —
  * plus direction semantics (corpus hits beat nothing, earlier batch
  * ids beat later ones, corpus×corpus pairs never surface). */
class IncrementalDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // disjoint vocabulary per seed so distinct seeds share zero n-grams
  private def doc(seed: Int, n: Int = 30): String =
    (0 until n).map(i => s"w${seed}x$i").mkString(" ")

  test("incremental verdict equals full-run ground truth on batch ids") {
    // corpus 0..49 distinct docs; batch: 100 = copy of 3, 101 = near
    // copy of 7, 102/103 = identical novel docs (in-batch dup),
    // 104 = unrelated novel, 105 = copy of 3 again (corpus id must win
    // over batch id 100 because 3 < 100)
    val corpus = (0 until 50).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val novel = doc(991)
    val batch = Seq(
      (100L, doc(3)),
      (101L, doc(7) + " zz qq"),
      (102L, novel),
      (103L, novel),
      (104L, doc(992)),
      (105L, doc(3))
    ).toDF("doc_id", "text")

    val inc = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .select("id", "is_dup", "dup_of")
      .as[(Long, Boolean, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    // ground truth from the full pairwise run, restricted to batch ids
    val full = Dedup.minhashPairs(corpus.union(batch), "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val partners = full.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .filter { case (me, other) => me >= 100L && other < me }
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val batchIds = Seq(100L, 101L, 102L, 103L, 104L, 105L)
    assert(inc.keySet == batchIds.toSet)
    batchIds.foreach { id =>
      val expected = partners.get(id)
      assert(inc(id) == ((expected.isDefined, expected)),
        s"id=$id inc=${inc(id)} expected=$expected")
    }
    // the shape the construction plants, asserted explicitly
    assert(inc(100L) == ((true, Some(3L))))
    assert(inc(101L) == ((true, Some(7L))))
    assert(inc(102L) == ((false, None))) // first occurrence in batch
    assert(inc(103L) == ((true, Some(102L)))) // in-batch, smaller id
    assert(inc(104L) == ((false, None)))
    assert(inc(105L) == ((true, Some(3L)))) // corpus id beats batch 100
  }

  test("jaccard is the score of the kept pair and exact copies score 1") {
    val corpus = Seq((1L, doc(1)), (2L, doc(2))).toDF("doc_id", "text")
    val batch = Seq((10L, doc(1))).toDF("doc_id", "text")
    val row = Dedup.incrementalDedup(corpus, batch, "doc_id", "text")
      .select("id", "dup_of", "jaccard")
      .as[(Long, Option[Long], Option[Double])].collect().head
    assert(row == ((10L, Some(1L), Some(1.0))))
  }
}
