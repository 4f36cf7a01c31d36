package graft

import graft.operators.{Dedup, HashClassifier}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashClassifierSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // pure-Scala replica of the classifier arithmetic (the spec's own
  // third implementation, independent of both Spark and DuckDB)
  private def norm(text: String): String =
    text.toLowerCase.replaceAll("\\s+", " ").trim
  private def feats(toks: Seq[String]): Seq[String] =
    toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"${a}_$b" }
  private def bucket(f: String): Long = {
    val padded = (f + " " * 8).take(8)
    val poly = padded.zipWithIndex.map { case (ch, k) =>
      (ch.toLong % 256L) * HashClassifier.CharPows(k)
    }.sum
    val h = poly + f.length.toLong * HashClassifier.LenMix
    ((h % HashClassifier.NumBuckets) + HashClassifier.NumBuckets) %
      HashClassifier.NumBuckets
  }
  private def weight(f: String): Long =
    (bucket(f) * HashClassifier.WMul + HashClassifier.WAdd) %
      HashClassifier.WRange - HashClassifier.WShift
  private def score(text: String): (Long, Long) = {
    val fs = feats(norm(text).split(" ").toSeq)
    (fs.size.toLong, fs.map(weight).sum)
  }

  test("scoreRaw matches the pure-Scala replica doc for doc") {
    val docs = Seq(
      (1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "single"),
      (3L, "  Mixed   CASE  and    runs of   whitespace "),
      (4L, "a b a b a b a b"),
      (5L, "internationalization counterrevolutionaries antidisestablishment"),
      (6L, ""))
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"),
        split(Dedup.normText(col("text")), " ").as("toks"))
      .select(col("doc_id"),
        (size(col("toks")).cast("long") * 2L - 1L).as("n_feats"),
        HashClassifier.scoreRaw(col("toks")).as("score_raw"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    docs.foreach { case (id, text) =>
      val (nf, sr) = score(text)
      assert(got(id) === (nf, sr), s"doc $id ('$text')")
    }
    // single-token doc: exactly one feature (no bigrams)
    assert(got(2L)._1 === 1L)
    // 9-token doc: 9 unigrams + 8 bigrams
    assert(got(1L)._1 === 17L)
  }

  test("rpad truncation: same first-8-chars + same length => same bucket") {
    // differ only after char 8; equal length, so the hash MUST collide
    val a = "abcdefghXXXX"
    val b = "abcdefghYYYY"
    assert(bucket(a) === bucket(b))
    val w = Seq((1L, Seq(a)), (2L, Seq(b))).toDF("id", "toks")
      .select(col("id"), HashClassifier.scoreRaw(col("toks")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(w(1L) === w(2L))
    // same prefix, DIFFERENT length: the LenMix term separates them
    assert(bucket("abcdefghX") !== bucket(a))
  }

  test("compiled kernel is bit-equal to the HOF formulation (r13)") {
    // adversarial token arrays: unicode (multi-byte code points — rpad/
    // ascii/length are code-point semantics), supplementary-plane chars,
    // empty strings, single tokens, >8-char features, empty arrays
    val cases: Seq[Seq[String]] = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("single"),
      Seq(""),
      Seq("", "", ""),
      Seq("café", "zürich", "niño"),
      Seq("日本語", "テスト", "漢字かな交じり文"),
      Seq("a" * 30, "b" * 9, "c"),
      Seq("𝕊𝕦𝕡𝕡𝕝", "𐍈𐍈", "plain"), // supplementary plane (surrogate pairs)
      Seq("mixed𝄞note", "under_score", "tail"),
      // NOTE: the empty ARRAY is excluded — the HOF's slice(toks, 2,
      // n-1) errors on it (unreachable from x46: split() always yields
      // >= 1 token); the kernel returns 0 there.
      (1 to 50).map(i => s"tok$i"))
    val df = cases.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
      .toDF("id", "toks")
    val got = df.select(col("id"),
        HashClassifier.scoreRaw(col("toks")).as("kernel"),
        HashClassifier.scoreRawHof(col("toks")).as("hof"))
      .as[(Long, Option[Long], Option[Long])].collect()
    got.foreach { case (id, k, h) =>
      assert(k === h, s"case $id: kernel $k != hof $h")
    }
  }

  test("verdict threshold is non-vacuous: both classes occur on real data") {
    val dir = TestSpark.sf
    val res = graft.llm.LlmQueries.x46HashClassifier(spark, dir)
    val byKeep = res.groupBy("keep").count()
      .as[(Boolean, Long)].collect().toMap
    assert(byKeep.getOrElse(true, 0L) > 0L, "no doc kept")
    assert(byKeep.getOrElse(false, 0L) > 0L, "no doc dropped")
    // score_norm is the exact division of the two integer columns
    val rows = res.select("n_feats", "score_raw", "score_norm")
      .as[(Long, Long, Double)].collect()
    rows.foreach { case (nf, sr, sn) =>
      assert(sn === sr.toDouble / (nf.toDouble * 32768.0))
    }
  }
}
