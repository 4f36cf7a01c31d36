package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface: the events table consumed as an
  * unbounded stream (file source here; Kafka/queue in production — the
  * transform graph is source-agnostic).
  *
  * Scale posture: watermarks bound state; windowed aggregation state is
  * per (window × event_type); dedup state is bounded by the watermark
  * horizon. Both survive arbitrarily long streams. */
object StreamingOps {

  /** The events parquet schema as written by the generator (nanosecond
    * timestamps are read as raw longs — see Tables.events). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over an events directory, ts normalized. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
      .withColumn("ts", timestamp_micros((col("ts") / 1000L).cast(LongType)))
  }

  /** S1: watermarked tumbling-window aggregation per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** S2: streaming exact dedup on event_id within the watermark horizon
    * (bounded state: ids older than the watermark are evicted). */
  def streamingDedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[windowedCounts]] for equivalence checks. */
  def windowedCountsBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))
}
