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
}
