package graft.expressions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Timedelta-string → int64 microseconds in one compiled call
  * (reference util/time/timedelta.pyx:136 `timedelta_string_to_ns`,
  * at microsecond width).
  *
  * Same grammar, same Java regex engine, same floor(x·unit + 0.5)
  * per-component arithmetic as the Column cascade it replaces
  * (TimeFns.timedeltaMicros) — but the ~20 regexp_replace /
  * regexp_extract / rlike machines that cascade inlined into generated
  * code become THREE statically-precompiled patterns matched at most
  * once each per row. Cuts whole-stage-codegen module size (the old
  * t22 module cost ~2.8 s of one-time Janino compilation) and per-row
  * work. Unparseable input → null; callers apply the error mode. */
case class TimedeltaParse(child: Expression, asHours: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_timedelta_parse"

  override def nullSafeEval(v: Any): Any =
    TimedeltaKernel.compute(v.asInstanceOf[UTF8String], asHours)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("td")
      s"""java.lang.Long $out = graft.expressions.TimedeltaKernel.compute($c, $asHours);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TimedeltaParse =
    copy(child = newChild)
}

object TimedeltaKernel {
  // the SAME pattern strings the oracle SQL is generated from
  // (graft.functions.TimeFns.{clockRe,secRe,abbrevRe,tdReplacements})
  // compiled ONCE per JVM. Declared here as literals to avoid an
  // initialization cycle; TimeFnsSpec pins them equal to TimeFns's.
  private val num = "(\\d+(?:\\.\\d+)?)"
  val clockReStr: String =
    s"^([+-])?(?:${num}w)?(?:${num}d)?(\\d+):(\\d{1,2})(?::(\\d{1,2}(?:\\.\\d+)?))?$$"
  val secReStr: String = s"^([+-])?${num}$$"
  val abbrevReStr: String =
    s"^([+-])?(?:${num}w)?(?:${num}d)?(?:${num}h)?(?:${num}m)?" +
      s"(?:${num}s)?(?:${num}ms)?(?:${num}us)?$$"
  val replacements: Seq[(String, String)] = Seq(
    "microseconds?|microsecs?" -> "us",
    "milliseconds?|millisecs?" -> "ms",
    "minutes?|mins?" -> "m",
    "seconds?|secs?" -> "s",
    "hours?|hrs?" -> "h",
    "days?" -> "d",
    "weeks?|wks?" -> "w")

  private val ws = Pattern.compile("\\s+")
  private val repl = replacements.map { case (p, r) => (Pattern.compile(p), r) }
  private val clockP = Pattern.compile(clockReStr)
  private val secP = Pattern.compile(secReStr)
  private val abbrevP = Pattern.compile(abbrevReStr)

  private val wUs = 6.048e11; private val dUs = 8.64e10
  private val hUs = 3.6e9; private val mUs = 6e7; private val sUs = 1e6

  @inline private def part(g: String): Double =
    if (g == null || g.isEmpty) 0.0 else java.lang.Double.parseDouble(g)
  // explicit floor(x + 0.5): engine-identical for the non-negative
  // components, unlike native round()
  @inline private def us(v: Double, unitUs: Double): Long =
    math.floor(v * unitUs + 0.5).toLong
  @inline private def sign(g: String): Long = if ("-" == g) -1L else 1L

  def compute(raw: UTF8String, asHours: Boolean): java.lang.Long = {
    // lower + strip ALL whitespace (collapse-to-empty makes the
    // Column version's trim-vs-Java-trim distinction moot)
    var s = ws.matcher(raw.toLowerCase.toString).replaceAll("")
    var i = 0
    while (i < repl.length) {
      s = repl(i)._1.matcher(s).replaceAll(repl(i)._2)
      i += 1
    }
    val cm = clockP.matcher(s)
    if (cm.matches()) {
      val hasSec = cm.group(6) != null && cm.group(6).nonEmpty
      val hm =
        if (hasSec)
          us(part(cm.group(4)), hUs) + us(part(cm.group(5)), mUs) +
            us(part(cm.group(6)), sUs)
        else {
          // 2-component clocks: minutes:seconds by default, hours:minutes
          // under as_hours (reference arguments.py:973)
          val (u1, u2) = if (asHours) (hUs, mUs) else (mUs, sUs)
          us(part(cm.group(4)), u1) + us(part(cm.group(5)), u2)
        }
      return java.lang.Long.valueOf(sign(cm.group(1)) *
        (us(part(cm.group(2)), wUs) + us(part(cm.group(3)), dUs) + hm))
    }
    val sm = secP.matcher(s)
    if (sm.matches())
      return java.lang.Long.valueOf(sign(sm.group(1)) * us(part(sm.group(2)), sUs))
    val am = abbrevP.matcher(s)
    if (am.matches() && s.exists(c => c >= '0' && c <= '9'))
      return java.lang.Long.valueOf(sign(am.group(1)) *
        (us(part(am.group(2)), wUs) + us(part(am.group(3)), dUs) +
          us(part(am.group(4)), hUs) + us(part(am.group(5)), mUs) +
          us(part(am.group(6)), sUs) + us(part(am.group(7)), 1000.0) +
          us(part(am.group(8)), 1.0)))
    null
  }
}

/** Complex-literal string → struct<re double, im double> in one
  * compiled call (reference convert/base.py:234 + convert/complex.py):
  * "a+bj" / "bj" / "a", numpy-style optional parens, i or j, optional
  * imaginary coefficient ("-j" = 0-1j). Same three patterns as the
  * Column cascade it replaces (Casts.toComplex string path), compiled
  * once per JVM instead of ~8 inlined regex runs per row. Unparseable
  * → null struct; callers apply the error mode. */
case class ComplexParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("re", DoubleType, nullable = true),
    StructField("im", DoubleType, nullable = true)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_complex_parse"

  override def nullSafeEval(v: Any): Any =
    ComplexKernel.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("cz")
      s"""InternalRow $out = graft.expressions.ComplexKernel.compute($c);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ComplexParse =
    copy(child = newChild)
}

object ComplexKernel {
  // identical strings to Casts.{complexBothRe,complexImRe,complexReRe}
  // (pinned equal by TimeFnsSpec); no lookarounds → the oracle's RE2
  // runs the same patterns
  private val fnum = "[+-]?(?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?"
  private val inum = "[+-](?:\\d+\\.?\\d*|\\.\\d+)(?:[eE][+-]?\\d+)?"
  val bothReStr: String = s"^\\(?($fnum)($inum)[ij]\\)?$$"
  val imReStr: String =
    s"^\\(?([+-]?(?:\\d+\\.?\\d*|\\.\\d+)?(?:[eE][+-]?\\d+)?)[ij]\\)?$$"
  val reReStr: String = s"^\\(?($fnum)\\)?$$"

  private val bothP = Pattern.compile(bothReStr)
  private val imP = Pattern.compile(imReStr)
  private val reP = Pattern.compile(reReStr)

  def compute(raw: UTF8String) : InternalRow = {
    val s = raw.trim().toString // SQL trim: 0x20 only
    val bm = bothP.matcher(s)
    if (bm.matches())
      return new GenericInternalRow(Array[Any](
        java.lang.Double.parseDouble(bm.group(1)),
        java.lang.Double.parseDouble(bm.group(2))))
    val im = imP.matcher(s)
    if (im.matches()) {
      val g = im.group(1)
      // mantissa-less coefficients like "e5" cast to null im in the
      // Column formulation (string→double cast fails) — mirror that
      val e = g.indexWhere(c => c == 'e' || c == 'E')
      val mantissa = if (e < 0) g else g.substring(0, e)
      val coeff: Any =
        if (g.isEmpty || g == "+") 1.0
        else if (g == "-") -1.0
        else if (mantissa.exists(c => c >= '0' && c <= '9'))
          java.lang.Double.parseDouble(g)
        else null
      return new GenericInternalRow(Array[Any](0.0, coeff))
    }
    val rm = reP.matcher(s)
    if (rm.matches())
      return new GenericInternalRow(Array[Any](
        java.lang.Double.parseDouble(rm.group(1)), 0.0))
    null
  }
}
