package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Overlapping-interval UNION (merge) per key — calendar
  * consolidation, uptime stitching, coverage measurement.
  *
  * Input: (key, ss, ee, n) interval rows (epoch-integer bounds,
  * `n` = event weight folded per merged island). Output: one row per
  * merged island (key, m_start, m_end, n_events). Touching intervals
  * (start == earlier end) merge.
  *
  * Algorithm: the classic sweep — an interval opens a new island iff
  * its start exceeds the running max end of ALL earlier intervals
  * (max-end over the unbounded-preceding lag frame), island id = the
  * running sum of open flags. Both windows and the island fold share
  * ONE (key) Exchange+Sort: the groupBy's (key, island) clustering is
  * satisfied by the window's hash partitioning on key, so the whole
  * operator is a single shuffle (PlanAuditSpec-guarded via q63).
  *
  * The tie order among intervals with equal start does not affect the
  * merged RESULT (each either extends the current island or opens one
  * — identical verdicts under any ss-tie permutation), but the window
  * needs a total order, so ties break (ee, n) — deterministic plans.
  *
  * Merge is ASSOCIATIVE on interval sets: merge(merge(A) ∪ B) ==
  * merge(A ∪ B), and n_events folds by addition when islands absorb —
  * the S16 streaming contract: state = the merged islands themselves
  * (one row per island regardless of how many events it absorbed,
  * never history-sized), each trigger re-sweeps state ∪ batch. */
object Intervals {

  def merge(iv: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val wOrd = Window.partitionBy(keyCol).orderBy("ss", "ee", "n")
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("prev_end", max(col("ee")).over(wPrev))
      .withColumn("opens",
        when(col("prev_end").isNull || col("ss") > col("prev_end"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(wCum))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col("ss")).as("m_start"), max(col("ee")).as("m_end"),
        sum(col("n")).as("n_events"))
      .drop("island")
  }
}
