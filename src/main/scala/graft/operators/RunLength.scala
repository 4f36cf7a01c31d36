package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Run-length compression of an ordered column — the distributed
  * re-expression of the reference's `sparse[T, fill]` storage decorator
  * (types/sparse.py): long runs of a repeated (fill) value collapse to
  * (start, length, value) triples.
  *
  * Ordering is by an explicit key column (global row order is
  * meaningless in a distributed table). The gaps-and-islands windows
  * partition-parallelize per value; decode re-expands with sequence().
  */
object RunLength {

  /** Encode: (value, start_key, run_len).
    * `orderCol` must be DENSE consecutive integers — that requirement is
    * what makes this scale: the global row number then equals
    * `k - min(k) + 1`, so the islands computation needs only per-VALUE
    * windows (partition-parallel), never a single-partition global sort. */
  def encode(df: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val minK = df.agg(min(col(orderCol)).cast("long")).head().getLong(0)
    val wVal = Window.partitionBy("value").orderBy("k")
    df.select(col(orderCol).cast("long").as("k"), col(valueCol).as("value"))
      .withColumn("grp",
        col("k") - lit(minK) + 1 - row_number().over(wVal))
      .groupBy("value", "grp")
      .agg(min(col("k")).as("start_key"), count(lit(1)).as("run_len"))
      .select("value", "start_key", "run_len")
  }

  /** Decode an RLE table back to (key, value) rows. */
  def decode(rle: DataFrame): DataFrame =
    rle.select(col("value"),
        explode(sequence(col("start_key"),
          col("start_key") + col("run_len") - 1)).as("k"))
      .select(col("k"), col("value"))

  /** Compression summary: rows vs runs and the implied ratio. */
  def stats(df: DataFrame, orderCol: String, valueCol: String): (Long, Long, Double) = {
    val n = df.count()
    val runs = encode(df, orderCol, valueCol).count()
    (n, runs, if (runs == 0) 0.0 else n.toDouble / runs)
  }
}
