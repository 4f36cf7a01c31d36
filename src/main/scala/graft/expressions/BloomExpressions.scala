package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe over a `bigint` column.
  *
  * The probe side of manual runtime filtering (the big-join idiom
  * Spark's own InjectRuntimeFilter applies when statistics allow): a
  * bloom built from the small/filtered side prunes the fact table
  * BEFORE its shuffle, so only rows that can possibly join pay the
  * exchange. The filter object rides into generated code as a
  * reference object — one virtual call per row inside whole-stage
  * codegen, no UDF/serialization per batch.
  *
  * Always compose with an exact join afterwards: a bloom admits false
  * positives (rate `fpp`), never false negatives, so `prune → exact
  * join` returns exactly the unpruned join's rows. */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainLong = copy(child = newChild)
}
