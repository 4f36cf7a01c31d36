package graft

import graft.expressions.{ArrayDotProduct, SortedLongArrayIntersectCount}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions so `spark.sql` users get them too:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * // or spark.sql.extensions=graft.GraftExtensions
  * spark.sql("SELECT graft_dot(a.v, b.v) FROM ...")
  * }}}
  *
  * [[GraftExtensions.register]] does the same on an existing session
  * (temp functions) for environments that can't set the conf. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  private def binary(name: String)(mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case es => throw new IllegalArgumentException(
      s"$name requires exactly 2 arguments, got ${es.length}")
  }

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two array<double>"),
      binary("graft_dot")(ArrayDotProduct)),
    ("graft_sorted_intersect_count",
      info("graft_sorted_intersect_count",
        "graft_sorted_intersect_count(a, b) - |a ∩ b| for sorted array<bigint>"),
      binary("graft_sorted_intersect_count")(SortedLongArrayIntersectCount)),
  )

  /** Register on a live session (temp-function variant). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
