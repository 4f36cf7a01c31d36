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

  /** The (id, dg) digest index of a corpus — the only corpus-side
    * state [[curateIncremental]] needs; compute once, store/persist. */
  def digests(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      md5(col(textCol)).as("dg"))

  /** PRECONDITION: `idCol` must be unique across `corpus` — the
    * verdict joins key on it, so a repeated id fans out into multiple
    * (and, for differing texts, conflicting) verdict rows. Crawl
    * pipelines get this from globally-unique doc ids; unions of
    * corpora must offset id ranges (the withCopies/+5e6 convention). */
  def curate(corpus: DataFrame, evalDocs: DataFrame,
      idCol: String, textCol: String,
      minQuality: Double = 0.5, minTokens: Int = 20,
      maxTokens: Int = 2000): DataFrame = {
    val base = corpus.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))

    // exact-dup verdict: min id per md5 digest keeps, the rest are dups
    val dgs = digests(corpus, idCol, textCol)
    val keepers = dgs.groupBy("dg").agg(min("id").as("keeper"))
    val dup = dgs.join(keepers, Seq("dg"))
      .select(col("id"), (col("id") =!= col("keeper")).as("is_dup"),
        when(col("id") =!= col("keeper"), col("keeper")).as("dup_of"))

    verdicts(dup, corpus, evalDocs, base, idCol, textCol,
      minQuality, minTokens, maxTokens)
  }

  /** Incremental (continuous-crawl) curation: verdict ONLY the batch,
    * against a precomputed corpus digest index (see [[digests]]) — the
    * corpus's digests/grams/quality are never recomputed per batch
    * (the incrementalDedup posture: "the corpus never re-pairs").
    * Per trigger the corpus-side cost is one map-only scan of the
    * digest index with the batch's digest set broadcast into it; only
    * index rows matching a batch digest (plus the batch itself) reach
    * the keeper aggregation. Verdicts equal
    * `curate(corpus ∪ batch).filter(batch ids)` — the spec asserts it.
    * Same id-uniqueness precondition, across corpus AND batch. */
  def curateIncremental(batch: DataFrame, corpusDigests: DataFrame,
      evalDocs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.5, minTokens: Int = 20,
      maxTokens: Int = 2000): DataFrame = {
    val base = batch.select(col(idCol).cast("long").as("id"),
      col(textCol).as("text"))
    val bd = digests(batch, idCol, textCol)
    // corpus index rows that can possibly matter: digest seen in batch
    val hits = corpusDigests
      .join(broadcast(bd.select("dg").distinct()), Seq("dg"), "left_semi")
      .select(col("id"), col("dg")) // USING-join put dg first; realign for the union
    val keepers = hits.union(bd).groupBy("dg").agg(min("id").as("keeper"))
    val dup = bd.join(keepers, Seq("dg"))
      .select(col("id"), (col("id") =!= col("keeper")).as("is_dup"),
        when(col("id") =!= col("keeper"), col("keeper")).as("dup_of"))

    verdicts(dup, batch, evalDocs, base, idCol, textCol,
      minQuality, minTokens, maxTokens)
  }

  /** Shared verdict assembly: contamination + quality over `docs`,
    * joined to the given dup relation, with the precedence CASE. */
  private def verdicts(dup: DataFrame, docs: DataFrame, evalDocs: DataFrame,
      base: DataFrame, idCol: String, textCol: String,
      minQuality: Double, minTokens: Int, maxTokens: Int): DataFrame = {
    // eval-set contamination (broadcast gram set, map-side join)
    val contam = Dedup.decontaminate(docs, evalDocs, idCol, textCol, w = 13)
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
