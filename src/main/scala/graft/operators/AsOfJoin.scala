package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: each left row picks the latest right row
  * with `rightTime <= leftTime` within the same key — the feature-join
  * primitive that keeps training pipelines leak-free (pandas
  * `merge_asof`; Spark has no native operator).
  *
  * Implementation is a composition, not a custom SparkPlan: tag both
  * sides, UNION, and per-key window-fill the right columns with
  * `last(..., ignoreNulls)` over (time, side) ordering. ONE shuffle on
  * the key, sorted once, streamed — no join explosion, no per-row
  * probing; skew handling falls out of AQE like any window. At equal
  * timestamps the right row sorts first, so matches are inclusive
  * (t_right == t_left qualifies), mirroring DuckDB/pandas semantics. */
object AsOfJoin {

  /** @param left       left (probe) relation
    * @param right      right (reference) relation
    * @param keyCols    equi-key column names present in both
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param rightVals  right columns to carry (renamed as-is onto the
    *                   result, null when no right row precedes)
    * @param rightTieBreak column ordering later-wins among right rows
    *                   with identical (key, time) — keeps results
    *                   deterministic when the right side has duplicates
    */
  def asof(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      rightTieBreak: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val t = "__asof_t"
    val side = "__asof_side" // 0 = right, 1 = left → right first at ties
    val tie = "__asof_tie"

    val l = left
      .withColumn(t, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(tie, lit(null).cast("long"))
    val lPadded = rightVals.foldLeft(l)((d, c) =>
      d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))

    val r0 = right
      .withColumn(t, col(rightTime))
      .withColumn(side, lit(0))
      .withColumn(tie, rightTieBreak.map(col(_).cast("long")).getOrElse(lit(0L)))
    val rProjected = keyCols.map(col) ++ Seq(col(t), col(side), col(tie)) ++
      rightVals.map(c => col(c).as(s"__r_$c")) ++
      leftCols.filterNot(keyCols.contains).map(c =>
        lit(null).cast(left.schema(c).dataType).as(c))
    val rPadded = r0.select(rProjected: _*)

    val unioned = lPadded.select(
      (keyCols.map(col) ++ Seq(col(t), col(side), col(tie)) ++
        rightVals.map(c => col(s"__r_$c")) ++
        leftCols.filterNot(keyCols.contains).map(col)): _*)
      .unionByName(rPadded.select(
        (keyCols.map(col) ++ Seq(col(t), col(side), col(tie)) ++
          rightVals.map(c => col(s"__r_$c")) ++
          leftCols.filterNot(keyCols.contains).map(col)): _*))

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(t).asc, col(side).asc, col(tie).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(unioned)((d, c) =>
      d.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w)))

    filled.filter(col(side) === 1)
      .select((leftCols.map(col) ++
        rightVals.map(c => col(s"__r_$c").as(s"r_$c"))): _*)
  }
}
