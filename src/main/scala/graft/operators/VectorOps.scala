package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector kernels over `array<float|double>` columns.
  *
  * All math is higher-order-function Column expressions (zip_with /
  * aggregate) — codegen'd, no UDFs, and summation is sequential
  * left-to-right so results are reproducible across engines/runs
  * (important both for the DuckDB oracle and for cluster determinism).
  */
object VectorOps {

  /** Elementwise dot product, computed in double: native codegen'd
    * expression (see [[graft.expressions.ArrayDotProduct]]); same
    * left-to-right summation as the HOF `aggregate(zip_with(...))`
    * formulation it replaces. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.ArrayDotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalized copy of a vector. `normAttr` must be a pre-staged
    * row ATTRIBUTE (e.g. `withColumn("nv", norm(col))` first) — an
    * inline norm expression inside the HOF lambda would re-evaluate the
    * whole dot product per element (the staging rule). Zero vectors
    * pass through. */
  def l2Normalize(v: Column, normAttr: Column): Column =
    when(normAttr === 0.0, v.cast("array<double>"))
      .otherwise(transform(v.cast("array<double>"), x => x / normAttr))

  /** Cosine similarity in double; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH: `n` planes of
    * dimension `dim`, seeded — no runtime randomness, so bucket
    * assignments are stable across runs and engines. */
  def hyperplanes(n: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Elementwise mean of an `array<double>` column (mergeable
    * TypedImperativeAggregate — one partial-aggregating pass; see
    * graft.expressions.VectorMeanAgg): mean-pooled document embeddings,
    * cluster centroids. */
  /** Driver-side self dot product, summed strictly left-to-right — the
    * SAME IEEE sequence as [[dot]] (ArrayDotProduct) and the oracles'
    * `list_inner_product(v, v)`. This exact order is load-bearing for
    * oracle bit-exactness; every driver-side caller (centroid norms,
    * k-means ipcc) must go through this one helper so the contract
    * lives in one place. */
  def selfDot(a: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * a(i); i += 1 }
    s
  }

  def meanPool(v: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.VectorMeanAgg(
      ColumnBridge.expression(v.cast("array<double>"))).toAggregateExpression())
  }

  /** Johnson–Lindenstrauss random projection onto `planes`: the
    * dimensionality-reduction map pass (64-dim corpus → |planes| dims)
    * that makes downstream ANN / clustering cheaper while approximately
    * preserving pairwise distances. Scaled by 1/√dim; purely map-side,
    * planes are plan literals — no join, no shuffle, codegen'd dots. */
  def randomProject(v: Column, planes: Seq[Array[Double]]): Column = {
    val scale = math.sqrt(planes.head.length.toDouble)
    array(planes.map(p => dot(v, array(p.map(lit(_)): _*)) / scale): _*)
  }

  /** Sign-LSH bucket key: one bit per hyperplane (random projection
    * sign), packed into a long. Cosine-similar vectors collide with
    * high probability (Charikar 2002 SimHash for angles). */
  def signBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit(_)): _*)
      when(dot(v, planeCol) >= 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
