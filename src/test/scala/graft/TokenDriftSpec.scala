package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TokenDriftSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("identical slices drift to exactly zero on every token") {
    val docs = Seq((1L, "a b c", true), (2L, "a b c", false))
      .toDF("id", "text", "in_a")
    val d = TokenDriftSpecHelper.terms(
      TextAnalysis.tokenDrift(docs, "text", col("in_a")))
    assert(d.nonEmpty)
    assert(d.forall { case (_, ab, ba) => ab == 0.0 && ba == 0.0 })
  }

  test("shifted slices: KL sums are positive (Gibbs) and the moved token dominates") {
    val docs = Seq(
      (1L, "x x x x y", true), (2L, "x x x y z", true),
      (3L, "y y y y x", false), (4L, "y y y z z", false),
    ).toDF("id", "text", "in_a")
    val d = TokenDriftSpecHelper.terms(
      TextAnalysis.tokenDrift(docs, "text", col("in_a")))
    val klAb = d.map(_._2).sum
    val klBa = d.map(_._3).sum
    assert(klAb > 0.0 && klBa > 0.0)
    // x is over-represented in A, y in B: each direction's top
    // contributor is the token that slice over-represents
    assert(d.maxBy(_._2)._1 == "x")
    assert(d.maxBy(_._3)._1 == "y")
  }

  test("vocabulary is shared: a token absent from one slice still scores") {
    val docs = Seq((1L, "only in a", true), (2L, "other words here", false))
      .toDF("id", "text", "in_a")
    val d = TokenDriftSpecHelper.terms(
      TextAnalysis.tokenDrift(docs, "text", col("in_a")))
    assert(d.map(_._1).toSet ==
      Set("only", "in", "a", "other", "words", "here"))
  }
}

private object TokenDriftSpecHelper {
  def terms(df: org.apache.spark.sql.DataFrame): Seq[(String, Double, Double)] = {
    import TestSpark.spark.implicits._
    df.select("tok", "kl_ab_term", "kl_ba_term")
      .as[(String, Double, Double)].collect().toSeq
  }
}
