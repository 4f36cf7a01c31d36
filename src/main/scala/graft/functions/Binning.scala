package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** pandas `cut` / `qcut` binning, Spark-shaped.
  *
  * Both variants derive their edges from ONE single-row aggregate over
  * the column (broadcast back as a literal row — the x11/x13 "stats
  * ride along" shape), so assignment is a pure map expression at any
  * corpus size: scan → agg(1 row) → map. `qcut`'s edges are the exact
  * interpolating percentiles (the q32/q50 verification contract;
  * `approx_percentile`'s t-digest is the documented 100 TB swap).
  *
  * Cf. reference pandas surface: `pd.cut(x, bins)` /
  * `pd.qcut(x, q)`. */
object Binning {

  /** Equal-width binning (`pd.cut`): `bins` intervals over the
    * column's [min, max]; the rightmost edge is inclusive and the
    * degenerate min==max column collapses to bin 0. Appends `bin`. */
  def cut(df: DataFrame, valCol: String, bins: Int): DataFrame = {
    val st = df.agg(min(col(valCol)).cast("double").as("__lo"),
      max(col(valCol)).cast("double").as("__hi"))
    df.crossJoin(broadcast(st))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), 0)
          .otherwise(least(
            floor((col(valCol).cast("double") - col("__lo")) /
              ((col("__hi") - col("__lo")) / bins)),
            lit(bins - 1))).cast("int"))
      .drop("__lo", "__hi")
  }

  /** Quantile binning (`pd.qcut`): `q` bins split at the exact
    * interpolating i/q percentiles; interval (e_{i-1}, e_i], lowest
    * included. Appends `bin`. */
  def qcut(df: DataFrame, valCol: String, q: Int): DataFrame = {
    require(q >= 2, s"qcut needs q >= 2, got $q")
    val ps = (1 until q).map(i => i.toDouble / q)
    val edges = df.agg(
      expr(s"percentile($valCol, array(${ps.mkString(", ")}))").as("__e"))
    val v = col(valCol).cast("double")
    val assign = (1 until q).foldRight(lit(q - 1): org.apache.spark.sql.Column) {
      case (i, rest) => when(v <= element_at(col("__e"), i), i - 1).otherwise(rest)
    }
    df.crossJoin(broadcast(edges))
      .withColumn("bin", assign.cast("int"))
      .drop("__e")
  }
}
