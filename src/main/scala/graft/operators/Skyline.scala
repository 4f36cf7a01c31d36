package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto frontier) query — Börzsönyi et al.,
  * "The Skyline Operator" (ICDE 2001). A row survives iff no other row
  * in its group DOMINATES it: dominator.x ≤ x AND dominator.y ≥ y with
  * at least one strict (x is minimized, y is maximized).
  *
  * Scale design (100 TB): the skyline is DISTRIBUTIVE —
  * skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so a
  * shuffle-free per-partition PRE-FILTER prunes dominated rows before
  * anything moves: only each partition's local frontier (typically
  * O(log n) of it for independent dims) reaches the one group-key
  * exchange. Both passes are the SAME sorted scan: in
  * (x asc, y desc) order with distinct (x, y) pairs, a row is
  * dominated iff some EARLIER row has y ≥ its y — every earlier row
  * has x < x, or x = x with y > y (strict, pairs distinct) — so
  * "keep iff y > running-max(y) over strictly-preceding rows" is
  * exact, and the global pass is one window over the pruned set.
  * Duplicate (x, y) points never dominate each other (neither strict),
  * so callers dedup first and carry multiplicity.
  */
object Skyline {

  /** Local frontier scan over one already-sorted iterator of
    * (group, x, y, payload...) rows: emit a row iff its y strictly
    * exceeds the running max y within its group. Exact per the
    * argument above; pure streaming O(1) state per group run. */
  private def frontierScan(
      it: Iterator[(String, Double, Long, Long, Long)])
      : Iterator[(String, Double, Long, Long, Long)] = {
    var g: String = null
    var best = Long.MinValue
    it.filter { r =>
      if (r._1 != g) { g = r._1; best = Long.MinValue }
      if (r._3 > best) { best = r._3; true } else false
    }
  }

  /** Skyline of `df` per `group`, minimizing `x` (double), maximizing
    * `y` (long), with `n`/`rep` multiplicity payload columns carried
    * through. Input must be distinct on (group, x, y). */
  def skyline(df: DataFrame, group: String, x: String, y: String,
      n: String, rep: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    // Pass 1 — partition-local prune, NO shuffle: sort each partition
    // by (group, x asc, y desc) and keep local frontiers only. The
    // sort is per-partition (sortWithinPartitions), the scan holds one
    // (group, max-y) pair of state; rows dropped here are dominated by
    // a same-partition row, so the global result is unchanged.
    val pruned = df
      .select(col(group).cast("string"), col(x).cast("double"),
        col(y).cast("long"), col(n).cast("long"), col(rep).cast("long"))
      .sortWithinPartitions(col(group), col(x).asc, col(y).desc)
      .as[(String, Double, Long, Long, Long)]
      .mapPartitions(frontierScan)
      .toDF(group, x, y, n, rep)
    // Pass 2 — global frontier: one group-key Exchange + Sort, the
    // same scan spelled as a strictly-preceding running-max window.
    val w = Window.partitionBy(group).orderBy(col(x).asc, col(y).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pruned
      .withColumn("_prevmax", max(col(y)).over(w))
      .filter(col("_prevmax").isNull || col(y) > col("_prevmax"))
      .drop("_prevmax")
  }
}
