package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Expression↔Column conversion (Spark 4
  * removed the public `new Column(expr)` constructor). Lives in an
  * org.apache.spark.sql subpackage solely to satisfy the access
  * qualifier; graft code calls only these two forwarders. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
