package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dictionary (categorical) encoding — the reference's `categorical[T]`
  * decorator as a fit/transform pair.
  *
  * Scale posture: the dictionary is built with one distinct+sort pass
  * (cardinality ≪ rows by definition of categorical data) and applied
  * via a BROADCAST join — the fact table never shuffles. Codes are
  * deterministic (sorted value order), so encodings are reproducible
  * across runs and clusters. */
object Categorical {

  /** Build the dictionary: (value, code) with codes 0..n-1 assigned in
    * sorted value order. */
  def fit(df: DataFrame, valueCol: String): DataFrame = {
    val w = Window.orderBy("value")
    df.select(col(valueCol).as("value")).distinct()
      .withColumn("code", (row_number().over(w) - 1).cast("int"))
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
