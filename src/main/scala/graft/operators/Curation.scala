package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation verdict — the pipeline a training-data
  * run actually executes, composed from the library's own signals:
  * exact dedup (keep-min), eval-set decontamination (13-gram overlap),
  * quality scoring, and a token-length window. One row per input doc
  * with the keep/drop decision and the FIRST firing drop reason
  * (precedence: dup > contaminated > low_quality > length — cheapest
  *-to-recompute signal wins ties, mirroring production pipelines that
  * short-circuit).
  *
  * Scale shape: three key-partitioned equi-joins (digest, then id
  * twice); the dup check shuffles (id, digest) pairs only, the
  * contamination check broadcasts the eval gram set
  * ([[Dedup.decontaminate]]), quality/length are map-side. No text
  * ever shuffles except the digest group's constant-size rows. */
object Curation {

  def curate(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      minQuality: Double = 0.5, minTokens: Int = 20,
      maxTokens: Int = 2000): DataFrame = {
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))

    // exact-dup verdict: min id per md5 digest keeps, the rest are dups
    val digests = base.select(col("id"), md5(col("text")).as("dg"))
    val keepers = digests.groupBy("dg").agg(min("id").as("keeper"))
    val dup = digests.join(keepers, Seq("dg"))
      .select(col("id"), (col("id") =!= col("keeper")).as("is_dup"),
        when(col("id") =!= col("keeper"), col("keeper")).as("dup_of"))

    // eval-set contamination (broadcast gram set, map-side join)
    val contam = Dedup.decontaminate(corpus, evalDocs, idCol, textCol, w = 13)
      .select(col("id"), col("contaminated"))

    // quality + token-length signals (pure map pass)
    val q = base.select(col("id") +: TextAnalysis.qualityColumns(col("text")): _*)
      .select("id", "n_tokens", "quality_score")

    dup.join(contam, Seq("id")).join(q, Seq("id"))
      .withColumn("len_ok",
        col("n_tokens").between(minTokens.toLong, maxTokens.toLong))
      .select(col("id"), col("is_dup"), col("dup_of"), col("contaminated"),
        col("n_tokens"), col("quality_score"),
        (!col("is_dup") && !col("contaminated") &&
          col("quality_score") >= minQuality && col("len_ok")).as("keep"),
        when(col("is_dup"), "dup")
          .when(col("contaminated"), "contaminated")
          .when(col("quality_score") < minQuality, "low_quality")
          .when(!col("len_ok"), "length")
          .as("drop_reason"))
  }
}
