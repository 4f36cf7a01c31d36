package graft

import graft.operators.Merge
import org.scalatest.funsuite.AnyFunSuite

/** CDC MERGE semantics on planted feeds: matched/not-matched edges and
  * the multi-batch fold (delete-then-reinsert survives, ops compose in
  * order). */
class MergeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  test("applyCdc: U/D/I with strict matched/not-matched edges") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batch = Seq(
      (1L, "U", "a2"), // matched update
      (2L, "D", ""),   // delete
      (4L, "I", "d"),  // fresh insert
      (9L, "U", "zz"), // update of a MISSING key → no-op
      (3L, "I", "cc")  // insert of a PRESENT key → no-op
    ).toDF("k", "op", "v")
    val out = Merge.applyCdc(snap, batch, "k", withAction = true)
    assert(collect(out) == Set((1L, "a2"), (3L, "c"), (4L, "d")))
    val actions = out.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(actions == Map(1L -> "U", 3L -> "K", 4L -> "I"))
  }

  test("applyCdc folds across batches (delete-then-reinsert)") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val batches = Seq(
      Seq((1L, "U", "a2"), (2L, "D", ""), (4L, "I", "d")),
      Seq((4L, "D", ""), (3L, "U", "c2"), (2L, "I", "b2")),
      Seq((2L, "U", "b3"), (5L, "I", "e")))
    val fin = batches.foldLeft(snap)((s, b) =>
      Merge.applyCdc(s, b.toDF("k", "op", "v"), "k"))
    assert(collect(fin) ==
      Set((1L, "a2"), (2L, "b3"), (3L, "c2"), (5L, "e")))
  }

  test("goldenRecord: each column survives independently, ties break by tieCol") {
    val feed = Seq(
      // (k, ts, oid, name, phone)
      (1L, 10L, 1L, Some("ann"), Some("111")),
      (1L, 20L, 2L, Some("anne"), None), // later, phone missing → keeps 111
      (1L, 30L, 3L, None, Some("333")),  // latest, name missing → keeps anne
      (2L, 10L, 4L, None, None),         // all null → nulls survive
      (3L, 10L, 5L, Some("bo"), None),   // same ts: higher oid wins name
      (3L, 10L, 6L, Some("bob"), None),
    ).toDF("k", "ts", "oid", "name", "phone")
    val g = Merge.goldenRecord(feed, Seq("k"), "ts", "oid",
        Seq("name", "phone"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)), Option(r.getString(3)))).toSeq
    assert(g == Seq(
      (1L, 3L, Some("anne"), Some("333")),
      (2L, 1L, None, None),
      (3L, 2L, Some("bob"), None)))
  }

  test("combineFirst: all four cell regimes + column union + null-b holes stay null") {
    val a = Seq(
      (1L, Some("a1"), Some(10L)), // both sides: a wins
      (2L, None, Some(20L)),       // a-null cell: b fills v only
      (3L, Some("a3"), None)       // a-only key: b's columns null
    ).toDF("k", "v", "x")
    val b = Seq(
      (1L, Some("b1"), "s1"),      // loses to a1
      (2L, Some("b2"), "s2"),      // fills the a-null
      (4L, None, "s4")             // b-only key, with a b-null cell
    ).toDF("k", "v", "s")
    val out = Merge.combineFirst(a, b, Seq("k")).collect().map(r =>
      (r.getLong(0),
        Option(r.get(r.fieldIndex("v"))).map(_.toString),
        if (r.isNullAt(r.fieldIndex("x"))) None else Some(r.getLong(r.fieldIndex("x"))),
        Option(r.get(r.fieldIndex("s"))).map(_.toString))).toSet
    assert(out == Set(
      (1L, Some("a1"), Some(10L), Some("s1")), // a wins v; b-only s rides
      (2L, Some("b2"), Some(20L), Some("s2")), // b patches the hole
      (3L, Some("a3"), None, None),            // a-only row intact
      (4L, None, None, Some("s4"))))           // b-only row; b's null stays
    // column union and order: keys first, then a's cols, then b-only
    assert(Merge.combineFirst(a, b, Seq("k")).columns.toSeq ==
      Seq("k", "v", "x", "s"))
  }
}
