package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table writers: pre-shuffle a relation ONCE at write time so
  * every later equi-join / aggregation on the bucket key runs with no
  * Exchange at all (Spark's bucketing metadata satisfies the join's
  * ClusteredDistribution; sortBy additionally satisfies the SMJ's
  * ordering, skipping the per-task sort).
  *
  * The 100 TB play: fact tables are written bucketed by their join key
  * (l_orderkey, document digest, …). A bucketed join of two tables with
  * the same bucket count reads co-located buckets directly — the
  * dominant shuffle of the pipeline is paid once at ingest, not per
  * query. */
object Bucketed {

  /** Write `df` as a bucketed (optionally bucket-sorted) managed
    * parquet table. `saveAsTable` is required — bucket metadata lives
    * in the catalog, not the files. */
  def write(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sorted: Boolean = true): Unit = {
    val spark = df.sparkSession
    // idempotence across JVMs: a previous session's managed-table
    // DIRECTORY survives the in-memory catalog, and CTAS refuses an
    // existing location it has no table for — drop both first
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
    (if (sorted) w.sortBy(bucketCol) else w).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With equal bucket
    * counts the physical plan contains no Exchange (asserted in
    * BucketedSpec). */
  def join(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(left).join(spark.table(right), col(leftKey) === col(rightKey))
  }

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partitionCol`. Predicates on the partition column prune to
    * matching directories at PLANNING time (PartitionFilters in the
    * scan — asserted in BucketedSpec): a date/source-scoped query over
    * a 100 TB corpus reads only its slice. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
