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

  /** Dimension-covariance matrix of an embedding corpus (whitening /
    * PCA prep, redundant-dimension detection): cov(i, j) =
    * E[x_i·x_j] − E[x_i]·E[x_j] for every pair i ≤ j, long-form.
    *
    * ONE aggregation pass: each row contributes its upper-triangular
    * outer product (fused native expression — a Column formulation
    * would be n(n+1)/2 separate plan nodes) and the raw vector, both
    * through the mergeable [[VectorOps.meanPool]]; the single moment
    * row then explodes against a broadcast (pos → i, j) map. Nothing
    * corpus-sized ever shuffles — only k-partial sums per partition. */
  def dimCovariance(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(vecCol).cast("array<double>").as("v"))
    val tri = ColumnBridge.column(graft.expressions.UpperTriOuterProduct(
      ColumnBridge.expression(col("v"))))
    val m = v.agg(VectorOps.meanPool(col("v")).as("mu"),
      VectorOps.meanPool(tri).as("m2"))
    val pairs = (for (i <- 0 until dim; j <- i until dim) yield (i, j))
      .zipWithIndex.map { case ((i, j), k) => (k, i, j) }
      .toDF("pos", "dim_i", "dim_j")
    m.select(col("mu"), posexplode(col("m2")).as(Seq("pos", "exy")))
      .join(broadcast(pairs), Seq("pos"))
      .select(col("dim_i"), col("dim_j"),
        // + 0.0 folds IEEE −0.0 to +0.0 (string-compared oracles)
        (round(col("exy") -
          element_at(col("mu"), col("dim_i") + 1) *
          element_at(col("mu"), col("dim_j") + 1), 6) + 0.0).as("cov"))
  }
}
