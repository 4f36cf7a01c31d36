package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.expressions.TopKAgg

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale posture: the query set is small and BROADCAST; the corpus
  * streams through one scan with its norms computed once (never per
  * pair). Brute force is the exactness baseline; sign-LSH prunes the
  * corpus to matching buckets before exact scoring (the 100 TB path —
  * candidates per query shrink by ~2^bits). */
object Similarity {

  private def withNorm(df: DataFrame, idName: String, vName: String,
      nName: String): DataFrame =
    df.select(col("vec_id").as(idName),
      col("embedding").cast("array<double>").as(vName))
      .withColumn(nName, VectorOps.norm(col(vName)))

  private def cosOf(av: String, bv: String, an: String, bn: String) = {
    val nn = col(an) * col(bn)
    when(nn === 0.0, 0.0)
      .otherwise(VectorOps.dot(col(av), col(bv)) / nn)
  }

  /** Per-query top-k of `(qid, id, cos)` rows via the mergeable
    * bounded-heap aggregate [[graft.expressions.TopKAgg]] — NOT a
    * `row_number` window. The window form repartitions every candidate
    * of a query into one task (the whole corpus per query under brute
    * force); the aggregate keeps ≤k rows per map partition per query
    * and merges k-sized heaps, so reduce-side work is
    * O(partitions × k), independent of corpus size. Output schema and
    * ordering are identical to the previous window formulation
    * (rank by cos desc, id asc; rk starting at 1). */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val hits = ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(col("cos")),
        ColumnBridge.expression(col("id")), k).toAggregateExpression())
    scored.groupBy("qid").agg(hits.as("hits"))
      .select(col("qid"), posexplode(col("hits")))
      .select(col("qid"), col("col.id").as("id"), col("col.score").as("cos"),
        (col("pos") + 1).cast("int").as("rk"))
  }

  /** Exact top-k by cosine for each query vector (brute force).
    * One pass over the corpus; per-query top-k via window over the
    * (queries × corpus) scored rows — only (id, score) wide. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val scored = withNorm(corpus, "id", "v", "nv")
      .crossJoin(broadcast(withNorm(queries, "qid", "qv", "nqv")))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosOf("v", "qv", "nv", "nqv").as("cos"))
    topK(scored, k)
  }

  /** IVF (inverted-file) ANN: K-means partitions the corpus into
    * `nCells` cells (index build = one MLlib fit, seeded/deterministic);
    * each query probes its `nProbe` nearest centroids and scores only
    * those cells' vectors exactly. The classic Faiss-IVF layout on
    * Spark: the cell assignment is the partition key, queries broadcast.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val feats = withNorm(corpus, "id", "v", "nv")
      .withColumn("features", array_to_vector(col("v")))
    val km = new KMeans().setK(nCells).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("cell")
    val model = km.fit(feats)
    val cells = model.transform(feats).select("id", "v", "nv", "cell")
    // centroid relation (tiny): cell id + centroid vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq.toDF("cell", "cv")
    // per query: nProbe nearest centroids by euclidean distance —
    // selected with the same bounded-heap aggregate as the final top-k
    // (score = -dist so "largest" = nearest; cell id breaks ties asc),
    // keeping every ANN plan window-free.
    val q = withNorm(queries, "qid", "qv", "nqv")
    val probeCells = q.crossJoin(broadcast(centroids))
      .withColumn("dist",
        aggregate(zip_with(col("qv"), col("cv"), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x))
      .select(col("qid"), (-col("dist")).as("cos"),
        col("cell").cast("long").as("id"))
    val probes = topK(probeCells, nProbe)
      .select(col("qid"), col("id").cast("int").as("cell"))
      .join(q, Seq("qid"))
      .select("qid", "qv", "nqv", "cell")
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosOf("v", "qv", "nv", "nqv").as("cos"))
    topK(scored, k)
  }

  /** LSH-bucketed ANN: candidates = corpus vectors sharing the query's
    * sign-LSH bucket (multi-probe over all 1- and 2-bit flips keeps
    * recall up — each probe is a cheap bucket lookup), then exact
    * cosine on candidates only. Probing Hamming ≤ 2 visits
    * 1 + b + b(b-1)/2 of the 2^b buckets: ~14% of the corpus at b=8,
    * against brute force's 100%. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, dim: Int = 64): DataFrame = {
    val planes = VectorOps.hyperplanes(bits, dim)
    val c = withNorm(corpus, "id", "v", "nv")
      .withColumn("bucket", VectorOps.signBucket(col("v"), planes))
    val flips: Seq[Long] = 0L +:
      ((0 until bits).map(i => 1L << i) ++
        (for (i <- 0 until bits; j <- (i + 1) until bits) yield (1L << i) | (1L << j)))
    val q = withNorm(queries, "qid", "qv", "nqv")
      .withColumn("qbucket", VectorOps.signBucket(col("qv"), planes))
      .withColumn("bucket", explode(array(
        flips.map(m => col("qbucket").bitwiseXOR(lit(m))): _*)))
    // no distinct: the probe masks are distinct XOR values and each
    // corpus vector lives in exactly one bucket, so a (qid, id) pair
    // matches at most one probe row — dedup would be a pure extra
    // exchange. (If probe sets ever overlap, dedup candidate (qid, id)
    // BEFORE scoring, not the scored rows.)
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), cosOf("v", "qv", "nv", "nqv").as("cos"))
    topK(scored, k)
  }
}
