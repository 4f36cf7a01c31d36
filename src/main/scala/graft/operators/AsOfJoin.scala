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

  /** The full pandas `merge_asof` parameter grid: `direction` ∈
    * backward (latest right ≤ t, [[asof]]'s semantics) / forward
    * (earliest right ≥ t) / nearest (closer of the two; exact tie →
    * backward, pinned), plus `tolerance` (matches farther than `tol`
    * time units null out). Ties at equal timestamps are INCLUSIVE in
    * both directions — RANGE frames over the time value, so a right
    * row at exactly t qualifies either way.
    *
    * Contract: `right` must be unique per (key, rightTime) — pre-dedup
    * with the q27 arg-max idiom; with duplicates the per-frame pick
    * would be partition-order-dependent.
    *
    * Scale shape: same as [[asof]] — tag, union, ONE shuffle on the
    * key; both directional fills ride the same Exchange+Sort (two
    * frame specs, zero extra shuffles), nearest/tolerance are pure row
    * expressions on the filled columns. */
  def asofDirected(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown direction $direction")
    val leftCols = left.columns.toSeq
    val t = "__asof_t"
    val side = "__asof_side"
    val vals = rightVals :+ rightTime // matched time rides as a value

    val l = vals.foldLeft(
        left.withColumn(t, col(leftTime).cast("long")).withColumn(side, lit(1)))(
      (d, c) => d.withColumn(s"__r_$c", lit(null).cast(right.schema(c).dataType)))
    val rProjected = keyCols.map(col) ++ Seq(col(t), col(side)) ++
      vals.map(c => col(c).as(s"__r_$c")) ++
      leftCols.filterNot(keyCols.contains).map(c =>
        lit(null).cast(left.schema(c).dataType).as(c))
    val r = right.withColumn(t, col(rightTime).cast("long"))
      .withColumn(side, lit(0)).select(rProjected: _*)

    val ordered = keyCols.map(col) ++ Seq(col(t), col(side)) ++
      vals.map(c => col(s"__r_$c")) ++
      leftCols.filterNot(keyCols.contains).map(col)
    val unioned = l.select(ordered: _*).unionByName(r.select(ordered: _*))

    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(t))
    val wb = w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = w.rangeBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = vals.foldLeft(unioned)((d, c) => d
      .withColumn(s"__b_$c", last(col(s"__r_$c"), ignoreNulls = true).over(wb))
      .withColumn(s"__f_$c", first(col(s"__r_$c"), ignoreNulls = true).over(wf)))

    val bt = col(s"__b_$rightTime").cast("long")
    val ft = col(s"__f_$rightTime").cast("long")
    val bOk = bt.isNotNull &&
      tolerance.map(tol => col(t) - bt <= tol).getOrElse(lit(true))
    val fOk = ft.isNotNull &&
      tolerance.map(tol => ft - col(t) <= tol).getOrElse(lit(true))
    val useBackward = direction match {
      case "backward" => bOk
      case "forward"  => lit(false)
      case "nearest"  => bOk && (!fOk || (col(t) - bt) <= (ft - col(t)))
    }
    val matched = direction match {
      case "backward" => bOk
      case "forward"  => fOk
      case "nearest"  => bOk || fOk
    }
    filled.filter(col(side) === 1)
      .select((leftCols.map(col) ++ vals.map(c =>
        when(matched && useBackward, col(s"__b_$c"))
          .when(matched && !useBackward, col(s"__f_$c"))
          .as(s"r_$c"))): _*)
  }
}
