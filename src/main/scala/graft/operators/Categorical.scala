package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Dictionary (categorical) encoding — the reference's `categorical[T]`
  * decorator as a fit/transform pair.
  *
  * Scale posture: the dictionary is built with one distinct pass plus a
  * range-partitioned sort + zipWithIndex (no single-partition window,
  * so high-cardinality inputs don't stall one task) and applied via a
  * BROADCAST join — the fact table never shuffles. Codes are
  * deterministic (rank in sorted value order, nulls first — invariant
  * to partitioning), so encodings are reproducible across runs and
  * clusters. */
object Categorical {

  /** Build the dictionary: (value, code) with codes 0..n-1 assigned in
    * sorted value order (nulls first). Range partitioning + local sort
    * gives a global order; zipWithIndex then numbers it without ever
    * collapsing to one partition. */
  def fit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select(col(valueCol).as("value")).distinct()
      .repartitionByRange(col("value"))
      .sortWithinPartitions(asc_nulls_first("value"))
    val schema = sorted.schema.add("code", IntegerType, nullable = false)
    val numbered = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row(r.get(0), i.toInt)
    }
    spark.createDataFrame(numbered, schema)
  }

  /** Replace `valueCol` with its integer code (broadcast join). */
  def transform(df: DataFrame, valueCol: String, dict: DataFrame): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("value", valueCol)), Seq(valueCol), "left")
      .drop(valueCol)
      .withColumnRenamed("code", valueCol)

  /** Recover values from codes (broadcast join). */
  def inverse(df: DataFrame, codeCol: String, dict: DataFrame): DataFrame =
    df.join(broadcast(dict.withColumnRenamed("code", codeCol)), Seq(codeCol), "left")
      .drop(codeCol)
      .withColumnRenamed("value", codeCol)
}
