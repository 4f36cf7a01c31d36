package graft.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Python's `//` and `%` as type-adaptive Catalyst expressions — the
  * arithmetic kernels behind [[graft.types.PredicateParser]]'s
  * `df.query` grammar (reference types/PredicateParser lineage;
  * pandas evaluates these with numpy's C semantics, which follow
  * Python's).
  *
  * The parser runs before resolution, so it cannot know operand
  * types; these expressions decide AFTER analysis:
  *
  *  - both operands integral → EXACT int64 `Math.floorDiv` /
  *    `Math.floorMod` — closing the documented >2^53 deviation where
  *    the old `floor(a / b)`-in-double compilation loses ulps against
  *    pandas' exact int64 floor division (and matching Python's
  *    divisor-sign `%` without the overflow hazard of the
  *    `((a % b) + b) % b` composition near Long.MaxValue);
  *  - anything else → the same double-domain forms as before
  *    (`floor(a/b)` → int64; `((a fmod b) + b) fmod b` → double),
  *    value-identical to the Column composition they replace.
  *
  * A zero divisor THROWS (ArithmeticException) on every path —
  * PINNED semantics, independent of the session's ANSI flag: Python
  * raises ZeroDivisionError for both int and float operands, and the
  * old compilation threw the same way under the ANSI sessions this
  * library runs in. Both expressions codegen to branch-free primitive
  * arithmetic picked at code-generation time. */
abstract class PyBinaryArith extends BinaryExpression {

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }
  protected def bothIntegral: Boolean =
    isIntegral(left.dataType) && isIntegral(right.dataType)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[NumericType]
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numeric operands, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  protected def toD(v: Any): Double = v match {
    case d: Decimal => d.toDouble
    case n: Number => n.doubleValue()
  }
  protected def toL(v: Any): Long = v.asInstanceOf[Number].longValue()

  protected def zeroDiv(): Nothing =
    throw new ArithmeticException(
      s"$prettyName: division by zero (Python raises ZeroDivisionError)")

  protected def genThrow: String =
    s"""throw new ArithmeticException(
       |  "$prettyName: division by zero (Python raises ZeroDivisionError)");
     """.stripMargin

  /** Java source snippet converting a child's generated value to
    * double (Decimal children carry an object type). */
  protected def dbl(v: String, dt: DataType): String = dt match {
    case _: DecimalType => s"$v.toDouble()"
    case _ => s"(double)($v)"
  }
}

/** Python floor division. Output is int64 on every path (Python's
  * float-in float-out `//` typing remains the documented deviation —
  * the double path floors to int64 like the composition it
  * replaces). */
case class PyFloorDiv(left: Expression, right: Expression)
    extends PyBinaryArith {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_py_floordiv"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (bothIntegral) {
      val d = toL(b)
      if (d == 0L) zeroDiv() else Math.floorDiv(toL(a), d)
    } else {
      val d = toD(b)
      if (d == 0.0) zeroDiv() else math.floor(toD(a) / d).toLong
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("pyfdDiv")
      if (bothIntegral)
        s"""long $d = (long)($b);
           |if ($d == 0L) { $genThrow }
           |${ev.value} = Math.floorDiv((long)($a), $d);
         """.stripMargin
      else
        s"""double $d = ${dbl(b, right.dataType)};
           |if ($d == 0.0) { $genThrow }
           |${ev.value} = (long) Math.floor(${dbl(a, left.dataType)} / $d);
         """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PyFloorDiv = copy(left = newLeft, right = newRight)
}

/** Python modulo (result takes the divisor's sign). Int64 exact when
  * both operands are integral, else the double fmod composition. */
case class PyMod(left: Expression, right: Expression)
    extends PyBinaryArith {
  override def dataType: DataType =
    if (bothIntegral) LongType else DoubleType
  override def prettyName: String = "graft_py_mod"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (bothIntegral) {
      val d = toL(b)
      if (d == 0L) zeroDiv() else Math.floorMod(toL(a), d)
    } else {
      val d = toD(b)
      if (d == 0.0) zeroDiv()
      else {
        val r = toD(a) % d
        (r + d) % d
      }
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val d = ctx.freshName("pymodDiv")
      if (bothIntegral)
        s"""long $d = (long)($b);
           |if ($d == 0L) { $genThrow }
           |${ev.value} = Math.floorMod((long)($a), $d);
         """.stripMargin
      else
        s"""double $d = ${dbl(b, right.dataType)};
           |if ($d == 0.0) { $genThrow }
           |${ev.value} = ((${dbl(a, left.dataType)} % $d) + $d) % $d;
         """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PyMod = copy(left = newLeft, right = newRight)
}
