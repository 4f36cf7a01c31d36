package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Shared lagged-series Pearson kernel: exact-integer forms
  * NUM = nΣxy−ΣxΣy, DX = nΣx²−(Σx)², DY = nΣy²−(Σy)² over
  * DECIMAL(38,0) sums of aligned (x_t, x_{t−k}) pairs, and the pinned
  * IEEE terminal NUM_d / (√DX_d · √DY_d) (sqrt and multiply are
  * correctly rounded; decimal→double casts are Spark BigDecimal
  * narrowing — the DuckDB oracle routes the same casts through
  * VARCHAR, the t61 HUGEINT→DOUBLE finding). Null below 2 pairs or at
  * EXACT integer zero variance (the t49 ulp lesson — matches pandas
  * NaN on constant series). Shared by batch t65 and the S35 streaming
  * monitor so both sides are the same expression tree by
  * construction. */
object SeriesStats {
  private val d38 = DecimalType(38, 0)

  /** Pearson r from exact pair-aligned sums (n plain integer column,
    * the five sums DECIMAL(38,0)). */
  def pearson(n: Column, sx: Column, sy: Column, sxy: Column,
      sxx: Column, syy: Column): Column = {
    val nD = n.cast(d38)
    val num = nD * sxy - sx * sy
    val dx = nD * sxx - sx * sx
    val dy = nD * syy - sy * sy
    when(n >= 2 && dx > 0 && dy > 0,
      num.cast(DoubleType) /
        (sqrt(dx.cast(DoubleType)) * sqrt(dy.cast(DoubleType))))
  }

  /** Shared rolling(4).quantile kernel (batch t68 + streaming S37 —
    * same expression tree by construction): 4-element ORDER
    * STATISTICS from the 5-comparator min/max selection network (no
    * sort, no arithmetic — each x_i is bit-for-bit one of the
    * inputs), then pandas' interpolation='linear' blends at q ∈
    * {0.25, 0.5, 0.75}: idx = q·(n−1), x_⌊idx⌋ + frac·(x_⌊idx⌋₊₁ −
    * x_⌊idx⌋) — ONE pinned IEEE multiply-add per quantile. Warm-up
    * (any null lag — fewer than 4 observations) yields null, pandas
    * NaN. Returns (q25, q50, q75). */
  def rollingQuantiles(v: Column, l1: Column, l2: Column,
      l3: Column): (Column, Column, Column) = {
    val a = least(v, l1)
    val b = greatest(v, l1)
    val c = least(l2, l3)
    val d = greatest(l2, l3)
    val x0 = least(a, c)
    val x3 = greatest(b, d)
    val m1 = greatest(a, c)
    val m2 = least(b, d)
    val x1 = least(m1, m2)
    val x2 = greatest(m1, m2)
    val warm = l1.isNull || l2.isNull || l3.isNull
    def q(lo: Column, hi: Column, frac: Double): Column =
      when(warm, lit(null)).otherwise(lo + lit(frac) * (hi - lo))
    (q(x0, x1, 0.75), q(x1, x2, 0.5), q(x2, x3, 0.25))
  }
}
