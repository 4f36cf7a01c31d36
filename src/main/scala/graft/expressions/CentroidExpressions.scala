package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused nearest-centroid argmin over an `array<double>` column.
  *
  * The Column formulation (array_min over k `struct(d, cid)` entries,
  * each with its own literal-array dot product) works but embeds
  * k·dim literal doubles in the plan: Janino compiles a fresh
  * multi-kilobyte expression per (k, centroid-values) pair — k-means
  * pays that compile EVERY iteration — and evaluation allocates a
  * k-struct array per row. Here the centroids ride as codegen
  * reference objects: the generated source is identical for every
  * centroid set of the same shape (compiled once, Janino-cached across
  * Lloyd iterations) and the loop is allocation-free.
  *
  * Result = `array(dBest, cidBest)` (both doubles; cids ≤ 2^53 are
  * exact). Ranking is lexicographic (d, cid) min — EXACTLY the
  * `array_min(struct(d, cid))` order this replaces, so oracles that
  * replay the ranking in SQL (`ORDER BY d ASC, cid ASC`) still match
  * bit-for-bit: per-centroid arithmetic is the same IEEE sequence
  * (left-to-right dot, identical operation order).
  */
object NearestCentroid {
  /** Euclidean-rank argmin loop (shared by eval and as doc for the
    * generated code): d_j = ipcc_j − 2·ip(v, c_j). */
  def euclid(a: ArrayData, cents: Array[Array[Double]], cids: Array[Long],
      ipccs: Array[Double]): GenericArrayData = {
    var bestD = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)
      val n = math.min(a.numElements(), cv.length)
      var ip = 0.0
      var i = 0
      while (i < n) { ip += a.getDouble(i) * cv(i); i += 1 }
      val d = ipccs(j) - ip * 2.0
      if (d < bestD || (d == bestD && cids(j) < bestCid)) {
        bestD = d; bestCid = cids(j)
      }
      j += 1
    }
    new GenericArrayData(Array(bestD, bestCid.toDouble))
  }

  /** Spherical-rank argmin: d_j = −cos(v, c_j), 0.0 on zero norms. */
  def cosine(a: ArrayData, nv: Double, cents: Array[Array[Double]],
      cids: Array[Long], ncs: Array[Double]): GenericArrayData = {
    var bestD = Double.PositiveInfinity
    var bestCid = Long.MaxValue
    var j = 0
    while (j < cents.length) {
      val cv = cents(j)
      val n = math.min(a.numElements(), cv.length)
      var ip = 0.0
      var i = 0
      while (i < n) { ip += a.getDouble(i) * cv(i); i += 1 }
      val denom = nv * ncs(j)
      val d = if (denom == 0.0) 0.0 else -(ip / denom)
      if (d < bestD || (d == bestD && cids(j) < bestCid)) {
        bestD = d; bestCid = cids(j)
      }
      j += 1
    }
    new GenericArrayData(Array(bestD, bestCid.toDouble))
  }
}

/** Upper-triangular outer product of an `array<double>` with itself:
  * output[k] = v[i]·v[j] for pairs (i, j), i ≤ j, flattened row-major —
  * the per-row moment contribution a covariance/Gram aggregation
  * consumes (feed through VectorMeanAgg for E[x_i·x_j] in ONE pass).
  * A Column formulation would need n(n+1)/2 separate expressions —
  * thousands of plan nodes for 64 dims; this is one tight loop. */
case class UpperTriOuterProduct(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_upper_tri_outer"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Double](n * (n + 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val vi = a.getDouble(i)
      var j = i
      while (j < n) { out(k) = vi * a.getDouble(j); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |int ${v}_n = $a.numElements();
         |double[] ${v}_out = new double[${v}_n * (${v}_n + 1) / 2];
         |int ${v}_k = 0;
         |for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |  double ${v}_vi = $a.getDouble(${v}_i);
         |  for (int ${v}_j = ${v}_i; ${v}_j < ${v}_n; ${v}_j++) {
         |    ${v}_out[${v}_k++] = ${v}_vi * $a.getDouble(${v}_j);
         |  }
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(${v}_out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): UpperTriOuterProduct = copy(child = newChild)
}

/** Euclidean variant; `ipccs` precomputed driver-side with the same
  * left-to-right sum the oracle's `list_inner_product(cv, cv)` uses. */
case class NearestCentroidEuclid(child: Expression,
    cents: Array[Array[Double]], cids: Array[Long], ipccs: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroid"

  override def nullSafeEval(v: Any): Any =
    NearestCentroid.euclid(v.asInstanceOf[ArrayData], cents, cids, ipccs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val idRef = ctx.addReferenceObj("cids", cids, "long[]")
    val ipRef = ctx.addReferenceObj("ipccs", ipccs, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val v = ev.value
      s"""
         |double ${v}_bd = Double.POSITIVE_INFINITY;
         |long ${v}_bc = Long.MAX_VALUE;
         |for (int ${v}_j = 0; ${v}_j < $cRef.length; ${v}_j++) {
         |  double[] ${v}_cv = $cRef[${v}_j];
         |  int ${v}_n = Math.min($a.numElements(), ${v}_cv.length);
         |  double ${v}_ip = 0.0;
         |  for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |    ${v}_ip += $a.getDouble(${v}_i) * ${v}_cv[${v}_i];
         |  }
         |  double ${v}_d = $ipRef[${v}_j] - ${v}_ip * 2.0;
         |  if (${v}_d < ${v}_bd || (${v}_d == ${v}_bd && $idRef[${v}_j] < ${v}_bc)) {
         |    ${v}_bd = ${v}_d; ${v}_bc = $idRef[${v}_j];
         |  }
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new double[]{${v}_bd, (double) ${v}_bc});
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroidEuclid = copy(child = newChild)
}

/** Spherical variant; `nv` is the row's precomputed norm column —
  * passed in (not recomputed) so the cosine uses the exact same value
  * the downstream within-cell pair comparison uses. */
case class NearestCentroidCosine(left: Expression, right: Expression,
    cents: Array[Array[Double]], cids: Array[Long], ncs: Array[Double])
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_nearest_centroid_cos"

  override def nullSafeEval(v: Any, nv: Any): Any =
    NearestCentroid.cosine(v.asInstanceOf[ArrayData],
      nv.asInstanceOf[Double], cents, cids, ncs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("centroids", cents, "double[][]")
    val idRef = ctx.addReferenceObj("cids", cids, "long[]")
    val ncRef = ctx.addReferenceObj("ncs", ncs, "double[]")
    nullSafeCodeGen(ctx, ev, (a, nv) => {
      val v = ev.value
      s"""
         |double ${v}_bd = Double.POSITIVE_INFINITY;
         |long ${v}_bc = Long.MAX_VALUE;
         |for (int ${v}_j = 0; ${v}_j < $cRef.length; ${v}_j++) {
         |  double[] ${v}_cv = $cRef[${v}_j];
         |  int ${v}_n = Math.min($a.numElements(), ${v}_cv.length);
         |  double ${v}_ip = 0.0;
         |  for (int ${v}_i = 0; ${v}_i < ${v}_n; ${v}_i++) {
         |    ${v}_ip += $a.getDouble(${v}_i) * ${v}_cv[${v}_i];
         |  }
         |  double ${v}_den = $nv * $ncRef[${v}_j];
         |  double ${v}_d = (${v}_den == 0.0) ? 0.0 : -(${v}_ip / ${v}_den);
         |  if (${v}_d < ${v}_bd || (${v}_d == ${v}_bd && $idRef[${v}_j] < ${v}_bc)) {
         |    ${v}_bd = ${v}_d; ${v}_bc = $idRef[${v}_j];
         |  }
         |}
         |$v = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new double[]{${v}_bd, (double) ${v}_bc});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidCosine =
    copy(left = newLeft, right = newRight)
}
