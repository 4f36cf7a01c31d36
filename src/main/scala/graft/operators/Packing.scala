package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-capacity training
  * sequences ("bins") by first-fit-in-order — the standard way to
  * batch variable-length documents for pretraining without padding
  * waste. Greedy in deterministic (group, id) order: a doc goes into
  * the current bin if it fits, else opens a new bin; a doc larger than
  * the capacity gets a bin of its own (flagged oversize, for the
  * caller's truncate/split policy).
  *
  * Scale shape: packing is inherently order-stateful WITHIN a group,
  * so the operator is one shuffle on the group key + a SECONDARY SORT
  * on id (flatMapSortedGroups — Spark sorts spill-safely inside the
  * exchange; the scan itself streams the iterator with O(1) state, so
  * a group never has to fit in memory). Parallelism = number of
  * groups; a single giant group serializes into one task BY DESIGN —
  * shard the key (e.g. source × day) upstream if that matters. */
object Packing {

  /** (grp, id, n_tok, bin_id, bin_pos, oversize): bin ids are dense
    * per group starting at 0; bin_pos orders docs inside a bin. */
  def packGreedy(docs: DataFrame, idCol: String, groupCol: String,
      nTokCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string").as("grp"),
        col(idCol).cast("long").as("id"), col(nTokCol).cast("int").as("n_tok"))
      .as[(String, Long, Int)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("id")) { (grp, it) =>
        var bin = -1L
        var fill = capacity + 1 // forces a fresh bin on the first doc
        var pos = 0
        it.map { case (_, id, nTok) =>
          if (fill + nTok <= capacity) { fill += nTok; pos += 1 }
          else { bin += 1; fill = nTok; pos = 0 }
          (grp, id, nTok, bin, pos, nTok > capacity)
        }
      }
      .toDF("grp", "id", "n_tok", "bin_id", "bin_pos", "oversize")
  }

  /** Per-bin utilization summary (bins, fill, waste) — the packing
    * quality metric a pipeline monitors. */
  def binStats(packed: DataFrame, capacity: Int): DataFrame =
    packed.groupBy("grp", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("fill"))
      .withColumn("waste",
        greatest(lit(capacity) - col("fill"), lit(0L)).cast("long"))
}
