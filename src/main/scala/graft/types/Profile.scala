package graft.types

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality companion to detect/typecheck
  * (reference: bertrand types are carriers for exactly these per-column
  * facts; `describe`-style profiling is what a pipeline runs before
  * choosing casts/filters).
  *
  * ONE aggregation pass over the table produces every metric for every
  * requested column: row count, nulls, exact distinct, min/max
  * (rendered as strings so heterogeneous columns stack into uniform
  * rows). The multi-COUNT(DISTINCT) plan is Spark's Expand — one scan,
  * expansion factor = #distinct aggs, partial-aggregated map-side; for
  * approximate-at-scale profiling swap in the HLL/theta sketches
  * (q30/q33) — exact distinct is the ORACLE-checkable form. */
object Profile {

  /** (column, n, n_null, n_distinct, min_s, max_s), one row per
    * requested column, ordered by column name. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs: Seq[Column] = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("n"),
        (col("n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_s"), col(s"${c}__max").as("max_s"))
    }
    row.select(explode(array(entries: _*)).as("e"))
      .select("e.column", "e.n", "e.n_null", "e.n_distinct", "e.min_s", "e.max_s")
      .orderBy("column")
  }
}
