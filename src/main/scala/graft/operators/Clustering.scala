package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over an embedding column — the actual
  * coarse quantizer behind SemDeDup / IVF at web scale (the md5-sample
  * quantizer of [[Dedup.semanticDedup]] and `Similarity.ivfTopK` is its
  * zero-iteration special case), and the generic corpus-structuring
  * primitive (topic bucketing, stratified curation, per-cluster
  * sampling) of a training-data pipeline.
  *
  * Determinism (the property that makes an exact oracle possible):
  *  - init = the md5-order sample idiom (k corpus vectors, cid 0..k-1
  *    in md5 order) — no RNG, layout-independent;
  *  - assignment ranks by relative squared euclidean distance
  *    ip(c,c) − 2·ip(v,c) with ties broken toward the smaller cid;
  *  - each update re-syncs: per-dim means are rounded to 6 decimals
  *    (the [[EmbedStats]] precedent), so partial-merge float-order
  *    wobble never leaks into the next iteration's comparisons;
  *  - an emptied cell keeps its previous centroid.
  *
  * Scale shape: centroids are plan literals (k·dim doubles — model
  * state, not data), so each assignment is a MAP-ONLY pass over the
  * corpus; each update is one mergeable [[VectorOps.meanPool]]
  * aggregate shuffling only k partial sums per partition. Per
  * iteration: one map pass + one k-row shuffle — textbook scalable
  * Lloyd. The driver collects k·dim doubles per iteration (model
  * state); corpus vectors are never collected. kmeans|| init is the
  * documented scale-up swap for the deterministic sample init. */
object Clustering {

  /** Runs `iters` Lloyd iterations and returns the final assignment:
    * (id, cluster, dist) with dist = euclidean distance to the final
    * centroid, rounded to 6 decimals. */
  def kmeansAssign(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8, iters: Int = 3): DataFrame = {
    // persisted for the driver loop (init collect + one aggregate per
    // iteration would otherwise each re-scan and re-cast the source);
    // released before returning — the final assignment recomputes from
    // the scan once, lazily, so no cache outlives the call
    val v = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v")).persist()

    // init: md5-order deterministic sample, cid = position in that order
    var cents: Array[(Int, Array[Double])] =
      v.orderBy(md5(col("id").cast("string")), col("id"))
        .limit(k).collect()
        .zipWithIndex.map { case (r, i) => (i, r.getSeq[Double](1).toArray) }

    // rank column for the current centroids: fused argmin over
    // (d, cid) — d = ip(c,c) − 2·ip(v,c), ipcc summed driver-side
    // left-to-right (same IEEE sequence as the oracle's
    // list_inner_product). Centroids are codegen REFERENCE objects
    // (expressions.NearestCentroidEuclid), so the generated source —
    // and its Janino compile — is shared across all iterations.
    def ranked(cs: Array[(Int, Array[Double])]): Column = {
      import org.apache.spark.sql.graft.ColumnBridge
      val ipccs = cs.map { case (_, cv) => VectorOps.selfDot(cv) }
      ColumnBridge.column(graft.expressions.NearestCentroidEuclid(
        ColumnBridge.expression(col("v")),
        cs.map(_._2), cs.map(_._1.toLong), ipccs))
    }

    for (_ <- 1 to iters) {
      val means = v.withColumn("cell",
          element_at(ranked(cents), 2).cast("int"))
        .groupBy("cell")
        .agg(VectorOps.meanPool(col("v")).as("raw"))
        .select(col("cell"), transform(col("raw"), x => round(x, 6)).as("cv"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      cents = cents.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
    }

    val win = ranked(cents)
    val out = v.select(col("id"), element_at(win, 2).cast("int").as("cluster"),
        round(sqrt(greatest(lit(0.0),
          element_at(win, 1) + VectorOps.dot(col("v"), col("v")))), 6)
          .as("dist"))
    v.unpersist()
    out
  }
}
