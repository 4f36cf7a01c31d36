package graft.sources

import graft.functions.{CastOptions, Casts}
import graft.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed ingestion: read semi-structured sources and apply graft's
  * content-based inference + cast pipeline — the reference's core
  * "arbitrary data in, losslessly typed data out" workflow
  * (bertrand: `pd.read_csv` → `cast`/`detect_type`).
  *
  * Two-phase by design for scale: phase 1 reads everything as strings
  * (no sampling surprises, no schema drift between partitions); phase 2
  * infers each column's type from ONE distributed aggregation pass and
  * applies coercing casts. The inference decision is global — unlike
  * per-partition samplers it cannot produce mixed schemas.
  */
object GraftReader {

  /** Infer + cast every string column of `df` to its detected type. */
  def inferAndCast(df: DataFrame, opts: CastOptions = CastOptions(errors = "coerce")): DataFrame =
    Detect.detectTypes(df).foldLeft(df) { case (d, (name, spec)) =>
      if (d.schema(name).dataType != StringType) d
      else spec match {
        case "bool" => d.withColumn(name, Casts.toBoolean(col(name), StringType, opts))
        case "int64" => d.withColumn(name, Casts.toInteger(col(name), StringType, GInteger(64), opts))
        case "float64" => d.withColumn(name, Casts.toFloat(col(name), StringType, GFloat(64), opts))
        case "datetime" => d.withColumn(name, Casts.toDatetime(col(name), StringType, opts))
        case _ => d // string / missing: leave as-is
      }
    }

  /** CSV → typed DataFrame (header expected; all columns read as
    * strings, then inferred). */
  def csv(spark: SparkSession, path: String,
      opts: CastOptions = CastOptions(errors = "coerce")): DataFrame =
    inferAndCast(
      spark.read.option("header", "true").option("inferSchema", "false").csv(path),
      opts)

  /** JSON lines → typed DataFrame (Spark parses structure; graft
    * refines string-typed leaves). */
  def json(spark: SparkSession, path: String,
      opts: CastOptions = CastOptions(errors = "coerce")): DataFrame =
    inferAndCast(
      spark.read.option("primitivesAsString", "true").json(path),
      opts)

  /** Parquet passthrough (already typed; inference applies only to
    * string columns that carry numeric/boolean/datetime content). */
  def parquet(spark: SparkSession, path: String,
      opts: CastOptions = CastOptions(errors = "coerce")): DataFrame =
    inferAndCast(spark.read.parquet(path), opts)
}
