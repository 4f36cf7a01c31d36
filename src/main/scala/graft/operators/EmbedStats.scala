package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-corpus quality analytics: the vector-side counterpart of
  * the text quality signals (x1–x8) — flag vectors that don't belong to
  * their own cluster/label, the standard mislabeled-or-garbage filter a
  * training pipeline runs over an embedded corpus before sampling.
  */
object EmbedStats {

  /** Cosine of every vector to its OWN label's centroid, plus an
    * outlier flag (`cos < threshold`): vectors anti-correlated with
    * their cluster are mislabeled or noise.
    *
    * Determinism: the centroid's components are rounded to 6 decimals
    * before the cosine, so the downstream dot/norm arithmetic is
    * bit-reproducible regardless of the float-summation order inside
    * the mean aggregate (partial-merge order differs run to run at
    * cluster scale; a last-ulp wobble must not flip an `is_outlier`
    * near the threshold).
    *
    * Scale shape: one mergeable [[VectorOps.meanPool]] aggregate keyed
    * on the label (label-cardinality result — tiny), broadcast back,
    * then a single map pass: no corpus shuffle at any point. */
  def centroidOutliers(df: DataFrame, labelCol: String, vecCol: String,
      idCol: String, threshold: Double = 0.0): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(labelCol).as("label"),
      col(vecCol).cast("array<double>").as("v"))
    val cents = v.groupBy("label")
      .agg(VectorOps.meanPool(col("v")).as("raw"))
      .select(col("label"), transform(col("raw"), x => round(x, 6)).as("cent"))
    v.join(broadcast(cents), Seq("label"))
      .withColumn("nv", VectorOps.norm(col("v")))
      .withColumn("nc", VectorOps.norm(col("cent")))
      .select(col("id"), col("label"),
        round(when(col("nv") * col("nc") === 0.0, 0.0)
            .otherwise(VectorOps.dot(col("v"), col("cent")) /
              (col("nv") * col("nc"))), 6)
          .as("cos_centroid"))
      .withColumn("is_outlier", col("cos_centroid") < threshold)
  }
}
