package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** d20 exactSubstringSpans (Lee et al. 2022 ExactSubstr semantics):
  * planted maximal-span cases plus the subsumption proof over d8's
  * fixed-gram dupSpans — per doc, the distinct 13-grams covered by d20
  * spans must EQUAL the distinct 13-grams with corpus df > 1 (the set
  * d8 counts), because every df>1 gram occurrence pairs with another
  * occurrence (→ lies in a span) and every span window matches another
  * position (→ its gram has df > 1). */
class ExactSubstrSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val L = 13

  // disjoint vocabulary per seed so distinct seeds share zero grams
  private def words(seed: Int, n: Int): Seq[String] =
    (0 until n).map(i => s"w${seed}x$i")

  private def spans(corpus: Seq[(Long, String)]): Seq[(Long, Long, Long, Long, Long)] =
    Dedup.exactSubstringSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted

  test("planted spans: full copy, interior span, maximality, multi-island, self-repeat") {
    val base = words(1, 40)
    val other = words(2, 40)
    val seg = words(3, 20) // the shared 20-token segment
    val segB = words(4, 15) // second shared segment, same doc pair
    val corpus = Seq(
      1L -> base.mkString(" "),
      2L -> base.mkString(" "), // exact copy of 1
      3L -> (words(5, 5) ++ base).mkString(" "), // prefixed copy of 1
      // 10/11 share seg at different offsets, flanked by disjoint vocab
      10L -> (words(6, 7) ++ seg ++ words(7, 9)).mkString(" "),
      11L -> (words(8, 3) ++ seg ++ words(9, 4) ++ segB).mkString(" "),
      // 12 carries segB so the (11,12) pair exists; (10,11) has ONE island
      12L -> (other ++ segB).mkString(" "),
      // 20 repeats a 15-token block within itself, separated by filler
      20L -> (words(10, 15) ++ words(11, 6) ++ words(10, 15)).mkString(" ")
    )
    val out = spans(corpus)
    // full copy: one maximal span covering all 40 tokens
    assert(out.filter(s => s._1 == 1L && s._2 == 2L) ==
      Seq((1L, 2L, 0L, 0L, 40L)))
    // prefixed copy: base aligned at offset 5 in doc 3, still 40 tokens
    assert(out.filter(s => s._1 == 1L && s._2 == 3L) ==
      Seq((1L, 3L, 0L, 5L, 40L)))
    // copies of the same base also pair with each other
    assert(out.filter(s => s._1 == 2L && s._2 == 3L) ==
      Seq((2L, 3L, 0L, 5L, 40L)))
    // shared segment: exactly the 20 tokens, MAXIMAL (not extended into
    // the disjoint flanks), at the planted offsets
    assert(out.filter(s => s._1 == 10L && s._2 == 11L) ==
      Seq((10L, 11L, 7L, 3L, 20L)))
    // segB between 11 and 12: second island, independent of seg
    assert(out.filter(s => s._1 == 11L && s._2 == 12L) ==
      Seq((11L, 12L, 27L, 40L, 15L)))
    // within-doc repeat: self-pair with pos_a < pos_b
    assert(out.filter(s => s._1 == 20L && s._2 == 20L) ==
      Seq((20L, 20L, 0L, 21L, 15L)))
    // nothing else — disjoint vocab seeds share no 13-grams
    assert(out.size == 6)
  }

  test("two shared segments between ONE pair yield two islands, not a bridge") {
    val s1 = words(21, 14)
    val s2 = words(22, 16)
    val corpus = Seq(
      1L -> (s1 ++ words(23, 5) ++ s2).mkString(" "),
      2L -> (s2 ++ words(24, 8) ++ s1).mkString(" ")
    )
    val out = spans(corpus)
    assert(out == Seq(
      (1L, 2L, 0L, 24L, 14L), // s1: doc1 @0, doc2 @16+8=24
      (1L, 2L, 19L, 0L, 16L) // s2: doc1 @14+5=19, doc2 @0
    ).sorted)
  }

  test("docs shorter than minLen and sub-threshold overlaps produce no spans") {
    val shared12 = words(31, 12) // one token short of L
    val corpus = Seq(
      1L -> words(30, 12).mkString(" "),
      2L -> words(30, 12).mkString(" "), // exact copies but < L tokens
      3L -> (shared12 ++ words(32, 10)).mkString(" "),
      4L -> (words(33, 10) ++ shared12).mkString(" ")
    )
    assert(spans(corpus).isEmpty)
  }

  test("removal: canonical survives, copies empty, prefixes kept, chains collapse") {
    val base = words(70, 40)
    val pre = words(71, 5)
    val corpus = Seq(
      1L -> base.mkString(" "),
      2L -> base.mkString(" "), // exact copy
      3L -> base.mkString(" "), // chained third copy
      4L -> (pre ++ base).mkString(" ") // prefixed copy
    )
    val out = Dedup.removeDuplicateSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is the earliest occurrence everywhere: fully intact
    assert(out(1L) == ((1L, 40L, 40L, 0L, base.mkString(" "))))
    // copies collapse onto the canonical — both become empty, not just
    // the second (chains don't protect later copies)
    assert(out(2L) == ((2L, 40L, 0L, 40L, "")))
    assert(out(3L) == ((3L, 40L, 0L, 40L, "")))
    // prefixed copy keeps exactly its 5 planted prefix tokens
    assert(out(4L) == ((4L, 45L, 5L, 40L, pre.mkString(" "))))
  }

  test("removal: overlapping spans from different partners union before cutting") {
    // doc 10's tokens [0,20) match doc 1, and [14,30) match doc 2 —
    // the two cut intervals overlap in [14,20) and must union to
    // [0,30), never double-count
    val segA = words(80, 20)
    val segB = words(81, 16)
    val tail10 = words(82, 8)
    val corpus = Seq(
      1L -> (segA ++ words(83, 4)).mkString(" "),
      2L -> (words(84, 6) ++ segA.drop(14) ++ segB.take(10)).mkString(" "),
      10L -> (segA ++ segB.take(10) ++ tail10).mkString(" ")
    )
    val out = Dedup.removeDuplicateSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // doc 10: [0,20) cut vs doc 1; [6,30) cut vs doc 2 (segA.drop(14)
    // ++ segB.take(10) = 16 tokens at doc10 offset 14... matched run
    // is doc2's tokens [6,22) against doc10 [14,30) = 16 >= 13) —
    // union [0,30), keeping only tail10
    assert(out(10L)._5 == tail10.mkString(" "),
      s"doc10 kept '${out(10L)._5}'")
    assert(out(10L)._3 == 8L && out(10L)._4 == 30L)
  }

  test("removal: within-doc repeat drops the later occurrence only") {
    val block = words(90, 15)
    val mid = words(91, 6)
    val corpus = Seq(20L -> (block ++ mid ++ block).mkString(" "))
    val out = Dedup.removeDuplicateSpans(
        corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, String)].collect().head
    assert(out == ((20L, 36L, 21L, 15L, (block ++ mid).mkString(" "))))
  }

  // ---- d24 cross-corpus form: pool × batch spans ---------------------------

  test("cross-corpus spans: pool×batch pairs only, verbatim/prefixed/novel arms") {
    val base = words(130, 40)
    val other = words(131, 30)
    val pool = Seq(1L -> base.mkString(" "), 2L -> other.mkString(" "))
    val batch = Seq(
      100L -> base.mkString(" "), // verbatim re-crawl of pool doc 1
      101L -> (words(132, 5) ++ other).mkString(" "), // prefixed copy of 2
      102L -> base.reverse.mkString(" "), // reversal: no shared 13-gram
      // in-BATCH copy of 100: must NOT pair (pool×batch only)
      103L -> base.mkString(" "))
    val out = Dedup.crossSubstringSpans(
        Dedup.positionalGrams(pool.toDF("doc_id", "text"), "doc_id", "text", L),
        Dedup.positionalGrams(batch.toDF("doc_id", "text"), "doc_id", "text", L),
        L)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sorted
    assert(out == Seq(
      (1L, 100L, 0L, 0L, 40L), // whole-document span
      (1L, 103L, 0L, 0L, 40L), // second verbatim batch copy, same span
      (2L, 101L, 0L, 5L, 30L) // interior span at the planted offset
    ).sorted)
  }

  // ---- d22 grouped form: expansion equality ------------------------------

  /** Expand exactSubstringSpansGrouped's output by its documented
    * rules (membership from the normalized-text groups) back to the
    * full d20 pair multiset. */
  private def expandGrouped(corpus: Seq[(Long, String)],
      grouped: Seq[(Long, Long, Long, Long, Long, Long)])
      : Seq[(Long, Long, Long, Long, Long)] = {
    val members: Map[Long, Seq[Long]] = corpus
      .groupBy(_._2.trim.toLowerCase.replaceAll("\\s+", " "))
      .map { case (_, ds) => val ids = ds.map(_._1).sorted; ids.head -> ids }
    val out = grouped.flatMap { case (ra, rb, sa, sb, len, nPairs) =>
      val rows: Seq[(Long, Long, Long, Long, Long)] =
        if (ra != rb) {
          // cross-group: orient by member ids, swapping starts when
          // the smaller member sits on the b side
          for (x <- members(ra); y <- members(rb)) yield
            if (x < y) (x, y, sa, sb, len) else (y, x, sb, sa, len)
        } else {
          val g = members(ra)
          val pairRows = for {
            i <- g.indices; j <- (i + 1) until g.size
          } yield (g(i), g(j), sa, sb, len)
          if (sa < sb) // within-doc span: every member + every pair
            g.map(x => (x, x, sa, sb, len)) ++ pairRows
          else // mirror (sa > sb) or full-doc (sa == sb == 0): pairs only
            pairRows
        }
      assert(rows.size.toLong == nPairs,
        s"row ($ra,$rb,$sa,$sb,$len) n_pairs=$nPairs expands to ${rows.size}")
      rows
    }
    out.sorted
  }

  test("grouped form: arithmetic expansion equals the full d20 pair multiset") {
    val block = words(110, 15)
    val mid = words(111, 6)
    // doc with a within-doc repeat — exercises within + mirror + full rows
    val docA = (block ++ mid ++ block).mkString(" ")
    val seg = words(112, 16)
    val docB = (seg ++ words(113, 9)).mkString(" ") // shares seg with docD
    val docD = (words(114, 4) ++ seg).mkString(" ")
    val corpus = Seq(
      // group A: three identical copies (interleaved ids vs group B so
      // the cross-orientation swap is exercised both ways)
      1L -> docA, 2L -> docA, 6L -> docA,
      // group B: two identical copies, rep id 0 < rep A — and docB
      // shares seg with singleton docD
      0L -> docB, 5L -> docB,
      // singleton sharing a segment with group B
      9L -> docD,
      // a short identical pair (< minLen tokens): contributes nothing
      20L -> words(115, 8).mkString(" "),
      21L -> words(115, 8).mkString(" "),
      // singleton with a partial copy of docA's block (cross vs group A)
      30L -> (words(116, 3) ++ block).mkString(" ")
    )
    val full = spans(corpus)
    val grouped = Dedup.exactSubstringSpansGrouped(
        corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(expandGrouped(corpus, grouped) == full)
    // the fold is real: group A alone is C(3,2)=3 member pairs +
    // 3 within-doc rows per island, yet the grouped report carries
    // ONE within + ONE mirror + ONE full row for it
    assert(grouped.count(r => r._1 == 1L && r._2 == 1L) == 3)
  }

  test("grouped form: all-singleton corpus reduces to d20 with n_pairs = 1") {
    val seg = words(120, 14)
    val corpus = Seq(
      1L -> (seg ++ words(121, 5)).mkString(" "),
      2L -> (words(122, 7) ++ seg).mkString(" "),
      3L -> words(123, 20).mkString(" "))
    val grouped = Dedup.exactSubstringSpansGrouped(
        corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(grouped.map(_._6).forall(_ == 1L))
    assert(grouped.map(r => (r._1, r._2, r._3, r._4, r._5)).sorted == spans(corpus))
  }

  // ---- d23 owned removal: equality with the pair form ---------------------

  test("owned removal equals pair-form removal on every planted corpus") {
    val base = words(70, 40)
    val pre = words(71, 5)
    val segA = words(80, 20)
    val segB = words(81, 16)
    val block = words(90, 15)
    val corpora: Seq[Seq[(Long, String)]] = Seq(
      // chains + prefixed copy (the d21 spec corpus)
      Seq(1L -> base.mkString(" "), 2L -> base.mkString(" "),
        3L -> base.mkString(" "), 4L -> (pre ++ base).mkString(" ")),
      // overlapping cut intervals from different partners
      Seq(1L -> (segA ++ words(83, 4)).mkString(" "),
        2L -> (words(84, 6) ++ segA.drop(14) ++ segB.take(10)).mkString(" "),
        10L -> (segA ++ segB.take(10) ++ words(82, 8)).mkString(" ")),
      // within-doc repeat + an exact copy of the repeating doc
      Seq(20L -> (block ++ words(91, 6) ++ block).mkString(" "),
        21L -> (block ++ words(91, 6) ++ block).mkString(" ")))
    corpora.foreach { corpus =>
      val pair = Dedup.removeDuplicateSpans(
          corpus.toDF("doc_id", "text"), "doc_id", "text", L)
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      val owned = Dedup.removeDuplicateSpansOwned(
          corpus.toDF("doc_id", "text"), "doc_id", "text", L)
        .as[(Long, Long, Long, Long, String)].collect().toSeq.sorted
      assert(owned == pair, s"corpus ${corpus.map(_._1)}")
    }
  }

  test("subsumes d8 dupSpans: span-covered grams == df>1 grams, per doc") {
    // d8's exact planted corpus shape in miniature: base docs, exact
    // copies, prefixed copies, plus a cross-doc shared segment
    val docs = (0 until 8).map(i => i.toLong -> words(40 + i, 30).mkString(" "))
    val seg = words(60, 18)
    val corpus = docs ++ Seq(
      100L -> docs(2)._2, // exact copy of 2
      101L -> (words(61, 5) ++ words(40 + 4, 30).map(identity)).mkString(" "),
      102L -> (words(62, 4) ++ seg ++ words(63, 6)).mkString(" "),
      103L -> (seg ++ words(64, 11)).mkString(" ")
    )
    val out = spans(corpus)

    // positional 13-grams per doc, computed independently driver-side
    val grams: Map[Long, Vector[(Int, String)]] = corpus.map { case (id, tx) =>
      val ts = tx.trim.toLowerCase.split("\\s+").toVector
      id -> (if (ts.size < L) Vector.empty
             else (0 to ts.size - L).map(i => i -> ts.slice(i, i + L).mkString(" ")).toVector)
    }.toMap
    // d8's duplicated vocabulary: per-doc DISTINCT grams with df > 1
    val df = grams.toSeq.flatMap { case (id, gs) => gs.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.size).toMap
    val d8Shared: Map[Long, Set[String]] = grams.map { case (id, gs) =>
      id -> gs.map(_._2).distinct.filter(g => df(g) > 1).toSet
    }
    // grams covered by d20 spans (window positions [start, start+len-L])
    val covered: Map[Long, Set[String]] = {
      val perDoc = out.flatMap { case (a, b, sa, sb, len) =>
        Seq(a -> (sa, len), b -> (sb, len))
      }
      corpus.map(_._1).map { id =>
        val cov = perDoc.filter(_._1 == id).flatMap { case (_, (st, len)) =>
          (st to st + len - L).map(p => grams(id)(p.toInt)._2)
        }.toSet
        id -> cov
      }.toMap
    }
    corpus.map(_._1).foreach { id =>
      assert(covered(id) == d8Shared(id),
        s"doc $id: covered=${covered(id).size} d8=${d8Shared(id).size}")
    }
    // and the aggregate counts match d8's engine output itself
    val d8out = Dedup.dupSpans(corpus.toDF("doc_id", "text"), "doc_id", "text", L)
      .select(col("id"), col("n_shared")).as[(Long, Long)].collect().toMap
    corpus.map(_._1).foreach { id =>
      assert(d8out(id) == d8Shared(id).size.toLong)
    }
  }

  test("dupSpans keeps a NULL-text doc with null counts (pre-r13 semantics)") {
    // the original size(shingleHashes(text)) projection kept a
    // null-text row as (id, null, 0, null); the gram-table derivation
    // must reproduce it (explode_outer + nullif), not drop the doc
    val seg = words(70, 20).mkString(" ")
    val corpus = Seq[(java.lang.Long, String)](
      (1L, seg), (2L, seg), (3L, null), (4L, words(71, 20).mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.dupSpans(corpus, "doc_id", "text", L)
      .select("id", "n_grams", "n_shared", "shared_frac")
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2),
          (if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L)) // null-text doc kept
    assert(out(3L) == ((None, 0L, None)))     // (null, 0, null) — old row
    assert(out(1L) == ((Some(8L), 8L, Some(1.0)))) // 20-L+1 grams, all shared
    assert(out(2L) == ((Some(8L), 8L, Some(1.0))))
    assert(out(4L) == ((Some(8L), 0L, Some(0.0)))) // disjoint vocab: none
  }
}
