package graft.functions

import graft.types._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Lossless compression (the reference's `downcast=` conversion arg and
  * data-compression feature): pick the narrowest type that holds a
  * column exactly.
  *
  * Scale posture: the decision needs only min/max (integers) or a
  * float32-roundtrip violation count (floats) — ONE aggregation pass
  * for all requested columns together, never a data collect.
  */
object Downcast {

  /** Narrowest signed integer type covering [lo, hi]. */
  def narrowestInt(lo: Long, hi: Long): GInteger =
    if (lo >= Byte.MinValue && hi <= Byte.MaxValue) GInteger(8)
    else if (lo >= Short.MinValue && hi <= Short.MaxValue) GInteger(16)
    else if (lo >= Int.MinValue && hi <= Int.MaxValue) GInteger(32)
    else GInteger(64)

  /** Decide the downcast target of every listed column in one pass.
    * Returns (column, min, max, targetSpec). */
  def plan(df: DataFrame, cols: Seq[String]): Seq[(String, Double, Double, String)] = {
    val aggs: Seq[Column] = cols.flatMap { c =>
      val isFloat = df.schema(c).dataType match {
        case FloatType | DoubleType => true
        case _ => false
      }
      Seq(
        min(col(c)).cast(DoubleType).as(s"${c}__min"),
        max(col(c)).cast(DoubleType).as(s"${c}__max"),
        (if (isFloat)
          count(when(col(c) =!= col(c).cast(FloatType).cast(DoubleType), 1))
        else
          count(when(col(c).cast(DoubleType) =!= col(c).try_cast(LongType).cast(DoubleType), 1))
        ).as(s"${c}__lossy"),
        count(when(col(c).cast(DoubleType) =!= floor(col(c).cast(DoubleType)), 1))
          .as(s"${c}__frac"),
      )
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def get(n: String): Double = row.getAs[Double](n)
    def lossy(n: String): Long = row.getAs[Long](n)
    cols.map { c =>
      val (lo, hi) = (get(s"${c}__min"), get(s"${c}__max"))
      val target = df.schema(c).dataType match {
        case FloatType | DoubleType if lossy(s"${c}__frac") == 0 =>
          // float column whose values are ALL integral → integer
          narrowestInt(lo.toLong, hi.toLong).spec
        case FloatType | DoubleType =>
          if (lossy(s"${c}__lossy") == 0) "float32" else "float64"
        case ByteType | ShortType | IntegerType | LongType => narrowestInt(lo.toLong, hi.toLong).spec
        case other => TypeResolver.fromSpark(other).spec
      }
      (c, lo, hi, target)
    }
  }

  /** Apply a downcast plan: cast each planned column to its target. */
  def apply(df: DataFrame, cols: Seq[String]): DataFrame =
    plan(df, cols).foldLeft(df) { case (d, (c, _, _, spec)) =>
      d.withColumn(c, col(c).cast(TypeResolver.resolve(spec).sparkType))
    }
}
