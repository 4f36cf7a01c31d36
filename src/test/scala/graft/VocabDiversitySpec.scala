package graft

import graft.operators.{EmbedStats, TextAnalysis}
import org.scalatest.funsuite.AnyFunSuite

/** x33 vocabulary growth + e13 diversity moments on planted inputs
  * with hand-computed answers. */
class VocabDiversitySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("vocabGrowth: first-occurrence buckets reproduce the hand-counted curve") {
    // ids 0..9, 5 buckets → bucket = id/2 exactly (equal-width DIV).
    // Vocabulary arrival: b0 plants {a,b,c}, b1 plants {d}, b2 nothing
    // new, b3 plants {e}, b4 nothing new.
    val texts = Seq(
      0L -> "a b", 1L -> "a c",       // bucket 0: new a,b,c
      2L -> "b d", 3L -> "a a",       // bucket 1: new d
      4L -> "c d", 5L -> "a b c",     // bucket 2: nothing new
      6L -> "e",   7L -> "a e",       // bucket 3: new e
      8L -> "b",   9L -> "d e a")     // bucket 4: nothing new
    val out = TextAnalysis.vocabGrowth(
        texts.toDF("doc_id", "text"), "text", "doc_id", nBuckets = 5)
      .orderBy("bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    assert(out.map(_._4).toSeq == Seq(3L, 1L, 0L, 1L, 0L)) // new_tokens
    assert(out.map(_._7).toSeq == Seq(3L, 4L, 4L, 5L, 5L)) // vocab_cum
    assert(out.map(_._2).forall(_ == 2L))                  // n_docs per bucket
    assert(out.map(_._5).toSeq == Seq(2L, 4L, 6L, 8L, 10L)) // docs_cum
    // token counts: per-doc sizes 2,2 | 2,2 | 2,3 | 1,2 | 1,3
    assert(out.map(_._6).toSeq == Seq(4L, 8L, 13L, 16L, 20L)) // tokens_cum
  }

  test("mattr: brute-force sliding-window distincts on planted docs incl. short/loop/empty") {
    // doc 1: a 3-word loop over 12 tokens (floor-level diversity at
    //   w=4), doc 2: all-distinct (MATTR 1.0), doc 3: shorter than the
    //   window (degrades to plain TTR — one whole-doc window),
    //   doc 4: empty (no tokens, mattr NULL)
    val docs = Seq(
      1L -> Iterator.continually(Seq("x", "y", "z")).flatten.take(12).mkString(" "),
      2L -> (1 to 10).map(i => s"w$i").mkString(" "),
      3L -> "p q p",
      4L -> "")
    val w = 4
    val got = TextAnalysis.mattr(docs.toDF("doc_id", "text"), "doc_id",
        "text", w = w)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    for ((id, text) <- docs) {
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val n = toks.length
      val wl = math.min(w, n)
      val nw = n - wl + 1
      val swt = (0 until math.max(nw, 1))
        .map(i => toks.slice(i, i + wl).distinct.size.toLong).sum
      val (gn, gty, gwl, gnw, gswt, gm) = got(id)
      assert(gn == n && gty == toks.distinct.size && gwl == wl,
        s"doc $id counts: ${got(id)}")
      assert(gswt == swt, s"doc $id window sum: $gswt vs $swt")
      if (n == 0) assert(gm.isEmpty)
      else {
        assert(gnw == nw)
        assert(gm.contains(swt.toDouble / (nw.toLong * wl).toDouble),
          s"doc $id mattr: $gm")
      }
    }
    // the loop doc's MATTR pins at 3 distinct per 4-window = 0.75
    assert(got(1L)._6.contains(0.75))
    assert(got(2L)._6.contains(1.0))
  }

  test("goodTuring: planted frequency-of-frequencies with hand-computed r*") {
    // tokens: a×1, b×1, c×2, d×3 → N=7, N_1=2, N_2=1, N_3=1
    val docs = Seq("a b c", "c d d", "d").toDF("text")
    val out = TextAnalysis.goodTuring(docs, "text", maxR = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3))).toMap
    assert(out(1L)._1 == 2L && out(2L)._1 == 1L && out(3L)._1 == 1L &&
      out(4L)._1 == 0L)
    // unseen-mass estimate = N_1/N = 2/7
    assert(math.abs(out(1L)._2 - 2.0 / 7.0) < 1e-6)
    assert(out(1L)._3 == 1.0)  // r*=2·N_2/N_1 = 2·1/2
    assert(out(2L)._3 == 3.0)  // r*=3·N_3/N_2 = 3·1/1
    assert(out(3L)._3 == 0.0)  // N_4 = 0
    assert(out(4L)._3.isNaN)   // N_4 = 0 ⇒ r* undefined (null)
  }

  test("x34 novelty: planted shared/unique grams count per source, partial shingle for short docs") {
    val docs = Seq(
      ("srcA", "a b c d"), // grams {a b c, b c d}: "a b c" shared with B
      ("srcB", "a b c"),   // gram {a b c}: fully shared → novelty 0
      ("srcC", "x y z w"), // both grams unique → novelty 1
      ("srcD", "q"))       // < 3 tokens: ONE partial shingle, unique
      .toDF("source", "text")
    val out = graft.llm.LlmQueries.queries("x34_source_novelty")
      .apply(spark, "/root/testdata/sf0.001") // dir unused below; rebuild inline
    // call the operator shape directly on the planted frame instead
    import org.apache.spark.sql.functions._
    val grams = docs.select(col("source"),
        explode(graft.operators.Dedup.shingleHashes(col("text"), 3)).as("g"))
      .distinct()
    val gstats = grams.groupBy("g").agg(count(lit(1)).as("n_src"))
    val res = grams.join(gstats, Seq("g")).groupBy("source")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("n_src") === 1, 1)).as("n_unique"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(res("srcA") == (2L, 1L))
    assert(res("srcB") == (1L, 0L))
    assert(res("srcC") == (2L, 2L))
    assert(res("srcD") == (1L, 1L))
    assert(out.columns.toSeq ==
      Seq("source", "n_grams", "n_unique", "novelty"))
  }

  test("diversityByLabel: moment identity equals hand-computed pairwise mean") {
    def v(xs: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); xs.foreach { case (i, x) => a(i) = x }; a
    }
    // label 0: right triangle (0,0), (3,0), (0,4) → sq dists 9, 25, 16
    // → mean 50/3; label 1: two identical vectors → mean 0
    val rows = Seq(
      (0L, 0, v()), (1L, 0, v(0 -> 3.0f)), (2L, 0, v(1 -> 4.0f)),
      (3L, 1, v(2 -> 2.0f)), (4L, 1, v(2 -> 2.0f)))
    val out = EmbedStats.diversityByLabel(
        rows.toDF("vec_id", "label", "embedding"), "label", "embedding")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))
      .toMap
    assert(out("0")._1 == 3L && out("1")._1 == 2L && out("all")._1 == 5L)
    // replay the engine's pinned op sequence: exact integer numerator on
    // the 1e-6 grid, then ÷n(n−1) ÷10¹² (differs from (50/3) by 1 ulp)
    assert(out("0")._2 == 100.0e12 / 6.0 / 1.0e12)
    assert(out("1")._2 == 0.0)
    // all-row: Σ_{i<j}‖xi−xj‖² over the 10 cross pairs = 9+16+25 (within
    // label 0) + 0 (within 1) + cross terms: (0,0)↔(0,0,2): 4 ... verify
    // via the identity instead: n=5, S2 = 9+16+4+4 = 33, per-dim sums
    // (3,4,4) → ss = 9+16+16 = 41; mean = 2(5·33−41)/(5·4) = 12.4
    assert(out("all")._2 == 2.0 * (5.0 * 33.0 - 41.0) / 20.0)
  }
}
