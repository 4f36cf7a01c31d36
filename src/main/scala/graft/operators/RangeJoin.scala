package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: pair rows whose times lie within `window` of
  * each other (same key). A naive inequality join degenerates to a
  * per-key cross product; this implementation buckets time into
  * `window`-sized cells and explodes each left row into its cell ±1 —
  * every qualifying pair shares a bucket, so the join is an EQUI-join
  * on (key, bucket) that Spark executes as a hash join, followed by the
  * exact range filter. Shuffle is 3× the left side, never quadratic. */
object RangeJoin {

  /** @param left  relation with `keyCols` and epoch time col `leftTime`
    * @param right relation with `keyCols` and epoch time col `rightTime`
    *              (column names must differ from `leftTime`)
    * @param window half-width of the match window, in time-column units
    */
  def within(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, window: Long): DataFrame = {
    require(leftTime != rightTime, "time columns must have distinct names")
    val cell = (col(leftTime) / window).cast("long") // epochs are >= 0
    val lExp = left.withColumn("__bucket",
      explode(array(cell - 1, cell, cell + 1)))
    val rExp = right.withColumn("__bucket",
      (col(rightTime) / window).cast("long"))
    lExp.join(rExp, (keyCols :+ "__bucket").toSeq)
      .filter(abs(col(leftTime) - col(rightTime)) <= window)
      .drop("__bucket")
  }
}
