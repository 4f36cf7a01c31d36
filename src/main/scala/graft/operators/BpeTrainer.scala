package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training on Spark — the vocabulary-
  * fitting pass of an LLM data pipeline (Sennrich et al. 2016).
  *
  * Shape: ONE corpus pass builds the (word, count) vocabulary table —
  * everything after iterates on that table, which is orders of
  * magnitude smaller than the corpus (the standard word-level BPE
  * trick). Each merge round is a tiny aggregation (adjacent-pair
  * counts weighted by word count) + a driver-side argmax (k·1 model
  * state, the k-means precedent) + a map-only merge application.
  *
  * Merge application semantics: non-overlapping LEFTMOST replacement
  * per round (what a regex/replace-based implementation does). For a
  * run like "aaaaa" with merge (a,a) this can differ from the
  * strictly-sequential greedy scan — both are accepted BPE variants;
  * this one is chosen because it replays EXACTLY in SQL `replace`,
  * making the whole 5-round fit oracle-checkable.
  */
object BpeTrainer {

  private val Sep = "\u0001"

  /** (word, cnt) vocabulary from whitespace tokens. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Fit `nMerges` BPE merges, return the tokenized vocabulary:
    * (word, cnt, n_tokens, tokens) — plus the learned merge list via
    * the second element. */
  def fit(docs: DataFrame, textCol: String,
      nMerges: Int = 5): (DataFrame, Seq[(Int, String, String, Long)]) = {
    var vocab = wordCounts(docs, textCol)
      .withColumn("sym",
        concat(lit(Sep), concat_ws(Sep, split(col("word"), "")), lit(Sep)))
      .persist()
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    for (it <- 1 to nMerges) {
      val top = vocab
        .withColumn("ws", expr(s"filter(split(sym, '$Sep'), x -> x <> '')"))
        .filter(size(col("ws")) >= 2)
        .withColumn("i", explode(expr("sequence(1, size(ws) - 1)")))
        .select(expr("element_at(ws, i)").as("l"),
          expr("element_at(ws, i + 1)").as("r"), col("cnt"))
        .groupBy("l", "r").agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()(0)
      val (l, r, c) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((it, l, r, c))
      val next = vocab.withColumn("sym",
        expr(s"replace(sym, '$Sep$l$Sep$r$Sep', '$Sep$l$r$Sep')")).persist()
      next.count()
      vocab.unpersist()
      vocab = next
    }
    val out = vocab
      .withColumn("toks", expr(s"filter(split(sym, '$Sep'), x -> x <> '')"))
      .select(col("word"), col("cnt"),
        size(col("toks")).as("n_tokens"),
        concat_ws(" ", col("toks")).as("tokens"))
    (out, merges.toSeq)
  }

  /** Encode the corpus with a fitted tokenizer: per-doc whitespace
    * word count and total BPE token count. The expensive merge
    * application ran ONCE per distinct word inside [[fit]] — encoding
    * is a word-keyed join of the corpus's exploded words against that
    * vocabulary (vocab ≪ corpus; AQE broadcasts it when it fits) plus
    * an integer sum, so the per-doc pass is explode → join → agg with
    * no string surgery. Integer counts sum order-free — the oracle
    * replays exactly at any partitioning. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      nMerges: Int = 5): DataFrame = {
    val vocab = fit(docs, textCol, nMerges)._1.select("word", "n_tokens")
    docs.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(vocab, Seq("word"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tokens").cast("long")).as("n_bpe_tokens"))
  }
}
