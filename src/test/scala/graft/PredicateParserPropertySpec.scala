package graft

import graft.types.PredicateParser
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Round-trip property test for the t57 df.query grammar: generate
  * random predicate ASTs, render each to the grammar's concrete
  * syntax with PRECEDENCE-AWARE (minimal) parenthesization and a
  * randomized choice of spelling (and/&, or/|, not/~, optional
  * redundant parens and whitespace), parse the string back, and prove
  * the parsed Column is pointwise indistinguishable from the Column
  * built directly from the AST — over a value grid that exercises
  * negatives, zero divisors (Spark's null-on-/0), ties and string
  * equality. All cases evaluate in ONE projection + ONE aggregate;
  * the seed is pinned so a failure is reproducible verbatim.
  *
  * What this catches that the example-based grids can't: every
  * precedence boundary (mul over add over cmp over not over and over
  * or), left-associativity (the renderer only parenthesizes
  * same-level RIGHT children — "a - b - c" must parse left-nested),
  * the '**' tower (RIGHT-assoc, binding over unary minus on its left
  * but admitting a signed right operand — "(a**b) ** c" needs the
  * parens, "a ** -b ** c" doesn't), chain conjunction semantics, and
  * the &/|/~ spellings binding at the boolean levels exactly as
  * their keyword twins. */
class PredicateParserPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---- AST ---------------------------------------------------------------
  private sealed trait Ar
  private case class ACol(n: String) extends Ar
  private case class ALong(v: Long) extends Ar
  private case class ADbl(v: Double) extends Ar
  private case class ARef(n: String) extends Ar // @env scalar
  private case class ANeg(a: Ar) extends Ar
  private case class ABin(op: String, l: Ar, r: Ar) extends Ar

  private sealed trait Bo
  private case class BCmp(op: String, l: Ar, r: Ar) extends Bo
  private case class BStrCmp(op: String, v: String) extends Bo // s vs literal
  private case class BChain(l: Ar, ops: List[(String, Ar)]) extends Bo
  private case class BIn(neg: Boolean, vals: Seq[Long]) extends Bo // x in (...)
  private case class BInRef(neg: Boolean) extends Bo // x in @ids
  private case class BBool(v: Boolean) extends Bo // bare True/False
  private case class BNot(b: Bo) extends Bo
  private case class BAnd(l: Bo, r: Bo) extends Bo
  private case class BOr(l: Bo, r: Bo) extends Bo

  // the @ref environment the render/parse/direct paths all share
  private val env = Map[String, Any](
    "lo" -> 2L, "half" -> 0.5, "ids" -> Seq(0L, 3L, 5L))
  private val envIds = Seq(0L, 3L, 5L)

  // ---- generation (pinned seed) ------------------------------------------
  private val rng = new Random(20260816L)
  private val relops = Vector("==", "!=", "<", "<=", ">", ">=")
  private val dbls = Vector(0.0, 0.5, -1.5, 2.25, 10.0)
  private val strs = Vector("a", "b", "zz")

  private def genAr(depth: Int): Ar =
    if (depth <= 0) rng.nextInt(5) match {
      case 0 => ACol(Vector("x", "y")(rng.nextInt(2)))
      case 1 => ACol("d")
      case 2 => ALong(rng.nextInt(13) - 4L)
      case 3 => ARef(Vector("lo", "half")(rng.nextInt(2)))
      case _ => ADbl(dbls(rng.nextInt(dbls.length)))
    }
    else rng.nextInt(8) match {
      case 0 => ANeg(genAr(depth - 1))
      // '/' with a random divisor excluded: under ANSI mode a random
      // tree can always build a zero divisor somewhere on the grid
      // and the JOB (not the comparison) would throw — true division
      // is pinned by the example grids and the t57 oracle instead
      case n if n <= 4 =>
        ABin(Vector("+", "-", "*")(rng.nextInt(3)),
          genAr(depth - 1), genAr(depth - 1))
      // '**' is total in double (Inf/NaN are deterministic values, so
      // pointwise agreement still holds) — random-generable
      case 5 => ABin("**", genAr(depth - 1), genAr(depth - 1))
      // '//' and '%' (the r13 PyFloorDiv/PyMod kernels) with a PINNED
      // NONZERO literal divisor, so the zero-divisor throw can't fire
      // while every (numerator type × divisor type × divisor sign)
      // combination — integral-exact vs double path — gets exercised
      case 6 =>
        val op = Vector("//", "%")(rng.nextInt(2))
        val div =
          if (rng.nextBoolean())
            ALong(Vector(-7L, -3L, 2L, 3L, 7L)(rng.nextInt(5)))
          else ADbl(Vector(-1.5, 0.5, 2.25)(rng.nextInt(3)))
        ABin(op, genAr(depth - 1), div)
      case _ => genAr(0)
    }

  private def genBo(depth: Int): Bo =
    if (depth <= 0) rng.nextInt(6) match {
      case 0 => BStrCmp(Vector("==", "!=")(rng.nextInt(2)),
        strs(rng.nextInt(strs.length)))
      case 1 => BIn(rng.nextBoolean(),
        Seq.fill(1 + rng.nextInt(3))(rng.nextInt(9) - 2L).distinct)
      case 2 => BChain(genAr(1),
        List.fill(1 + rng.nextInt(2))(
          (relops(rng.nextInt(6)), genAr(1))))
      case 3 => BInRef(rng.nextBoolean())
      case 4 => BBool(rng.nextBoolean())
      case _ => BCmp(relops(rng.nextInt(6)), genAr(1), genAr(1))
    }
    else rng.nextInt(4) match {
      case 0 => BNot(genBo(depth - 1))
      case 1 => BAnd(genBo(depth - 1), genBo(depth - 1))
      case 2 => BOr(genBo(depth - 1), genBo(depth - 1))
      case _ => genBo(0)
    }

  // ---- direct Column build (the reference reading) ------------------------
  private def colAr(a: Ar): Column = a match {
    case ACol(n) => col(n)
    case ALong(v) => lit(v)
    case ADbl(v) => lit(v)
    case ARef(n) => lit(env(n))
    case ANeg(x) => -colAr(x)
    case ABin("+", l, r) => colAr(l) + colAr(r)
    case ABin("-", l, r) => colAr(l) - colAr(r)
    case ABin("*", l, r) => colAr(l) * colAr(r)
    case ABin("**", l, r) => pow(colAr(l), colAr(r))
    case ABin("//", l, r) =>
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PyFloorDiv(
          org.apache.spark.sql.graft.ColumnBridge.expression(colAr(l)),
          org.apache.spark.sql.graft.ColumnBridge.expression(colAr(r))))
    case ABin("%", l, r) =>
      org.apache.spark.sql.graft.ColumnBridge.column(
        graft.expressions.PyMod(
          org.apache.spark.sql.graft.ColumnBridge.expression(colAr(l)),
          org.apache.spark.sql.graft.ColumnBridge.expression(colAr(r))))
    case ABin(_, l, r) => colAr(l) / colAr(r)
  }
  private def rel(op: String, l: Column, r: Column): Column = op match {
    case "==" => l === r
    case "!=" => l =!= r
    case "<" => l < r
    case "<=" => l <= r
    case ">" => l > r
    case ">=" => l >= r
  }
  private def colBo(b: Bo): Column = b match {
    case BCmp(op, l, r) => rel(op, colAr(l), colAr(r))
    case BStrCmp(op, v) => rel(op, col("s"), lit(v))
    case BIn(neg, vals) =>
      val in = col("x").isin(vals: _*); if (neg) !in else in
    case BInRef(neg) =>
      val in = col("x").isin(envIds: _*); if (neg) !in else in
    case BBool(v) => lit(v)
    case BChain(l, ops) =>
      // Python's conjunction reading, middle operands evaluated once
      val (acc, _) = ops.foldLeft(
        (lit(true), colAr(l))) { case ((a, prev), (op, rAst)) =>
        val r = colAr(rAst); (a && rel(op, prev, r), r)
      }
      acc
    case BNot(x) => !colBo(x)
    case BAnd(l, r) => colBo(l) && colBo(r)
    case BOr(l, r) => colBo(l) || colBo(r)
  }

  // ---- rendering: minimal parens per the pinned precedence ----------------
  // arith levels: add 0 < mul 1 < neg 2 < pow 3 < atom 4. +|-|* are
  // left-assoc (RIGHT child needs strictly higher level); '**' is
  // RIGHT-assoc binding over unary minus on its left, so its LEFT
  // child must be atom-level and its right child is a unary (level 2)
  private def arLevel(a: Ar): Int = a match {
    case ABin("+" | "-", _, _) => 0
    case ABin("**", _, _) => 3
    case ABin(_, _, _) => 1
    case ANeg(_) => 2
    case _ => 4
  }
  private def sp: String = if (rng.nextBoolean()) " " else "  "
  private def renderAr(a: Ar, ctx: Int): String = {
    val s = a match {
      // 1-in-4: backtick an ordinary name — `x` must read as x
      case ACol(n) => if (rng.nextInt(4) == 0) s"`$n`" else n
      case ARef(n) => s"@$n"
      case ALong(v) => if (v < 0) s"-${-v}" else v.toString
      case ADbl(v) =>
        // 1-in-3: a scientific-notation spelling from the pinned pool
        // (each is the exact same double after parse — decimal→binary
        // conversion is value-based, so 5e-1 == 0.5 bit-for-bit)
        val sci = Map(0.0 -> "0e0", 0.5 -> "5e-1", -1.5 -> "-15E-1",
          2.25 -> "225e-2", 10.0 -> "1E1")
        if (rng.nextInt(3) == 0 && sci.contains(v)) sci(v)
        else {
          val t = if (v < 0) s"-${-v}" else v.toString
          if (t.contains('.')) t else t + ".0"
        }
      case ANeg(x) => "-" + renderAr(x, 2)
      case ABin("**", l, r) =>
        renderAr(l, 4) + sp + "**" + sp + renderAr(r, 2)
      case ABin(op, l, r) =>
        renderAr(l, arLevel(a)) + sp + op + sp + renderAr(r, arLevel(a) + 1)
    }
    // negative literals are unary-minus applications, level 2
    val lvl = a match {
      case ALong(v) if v < 0 => 2
      case ADbl(v) if v < 0 => 2
      case _ => arLevel(a)
    }
    if (lvl < ctx || (rng.nextInt(4) == 0 && !s.startsWith("-")))
      "(" + s + ")" else s
  }
  // bool levels: or 0 < and 1 < not 2 < cmp 3
  private def boLevel(b: Bo): Int = b match {
    case BOr(_, _) => 0
    case BAnd(_, _) => 1
    case BNot(_) => 2
    case _ => 3
  }
  private def renderBo(b: Bo, ctx: Int): String = {
    val s = b match {
      case BCmp(op, l, r) => renderAr(l, 0) + sp + op + sp + renderAr(r, 0)
      case BStrCmp(op, v) => "s" + sp + op + sp + s"'$v'"
      case BIn(neg, vals) =>
        "x" + (if (neg) " not in " else " in ") +
          vals.mkString("(", ", ", ")")
      case BInRef(neg) =>
        "x" + (if (neg) " not in " else " in ") + "@ids"
      case BBool(v) => if (v) "True" else "False"
      case BChain(l, ops) =>
        renderAr(l, 0) + ops.map { case (op, r) =>
          sp + op + sp + renderAr(r, 0)
        }.mkString
      case BNot(x) =>
        (if (rng.nextBoolean()) "not " else "~") + renderBo(x, 2)
      case BAnd(l, r) =>
        renderBo(l, 1) +
          (if (rng.nextBoolean()) " and " else s"$sp&$sp") +
          renderBo(r, 2)
      case BOr(l, r) =>
        renderBo(l, 0) +
          (if (rng.nextBoolean()) " or " else s"$sp|$sp") +
          renderBo(r, 1)
    }
    if (boLevel(b) < ctx || rng.nextInt(4) == 0) "(" + s + ")" else s
  }

  test("integral // and % are exact past 2^53 and throw on zero divisor") {
    val df = Seq((9007199254740993L, 3L)).toDF("a", "b") // 2^53 + 1
    def one(p: String): Any =
      df.select(PredicateParser.parse(p, Map.empty).as("v")).head().get(0)
    // double-domain floor((2^53+1)/3) would land on 3002399751580330
    // (the numerator rounds DOWN to 2^53 in double); exact int64 gives
    // the true quotient
    assert(one("a // b == 3002399751580331") == true)
    assert(one("a % b == 0") == true)
    assert(one("-9007199254740993 // 3 == -3002399751580331") == true)
    // divisor-sign results, both signs, exact path
    assert(one("-8 // -3 == 2") == true)
    assert(one("-8 % -3 == -2") == true)
    assert(one("7 % -3 == -2") == true)
    // mixed operands stay on the double path (double typing):
    // (double)(2^53+1) ties-to-even DOWN to 2^53, and 2^53 ≡ 2 mod 3
    // — where the exact-integral path on the long operand gives 0
    assert(one("a * 1.0 % 3") == 2.0)
    assert(one("a % 3") == 0L)
    val ex = intercept[Exception](one("a // (b - 3)"))
    def zdiv(t: Throwable): Boolean =
      t != null && (t.isInstanceOf[ArithmeticException] || zdiv(t.getCause))
    assert(zdiv(ex), s"expected ArithmeticException cause chain, got $ex")
  }

  test("120 random ASTs: parse(render(ast)) is pointwise == direct build") {
    // value grid: negatives, zero (null divisor), ties with the
    // literal pools, and every string in the cmp pool
    val rows = for {
      x <- -4L to 7L; y <- Seq(-2L, 0L, 1L, 3L)
      d <- Seq(-1.5, 0.0, 0.5, 2.25); s <- Seq("a", "b", "zz")
    } yield (x, y, d, s)
    val df = rows.toDF("x", "y", "d", "s")
    // render ONCE and keep the exact text — the renderer draws from
    // the rng, so a re-render would not reproduce the failing string
    val cases = Seq.fill(120)(genBo(2 + rng.nextInt(2)))
      .map(ast => (ast, renderBo(ast, 0)))
    val cols = cases.zipWithIndex.flatMap { case ((ast, rendered), i) =>
      val parsed =
        try PredicateParser.parse(rendered, env)
        catch {
          case e: IllegalArgumentException =>
            fail(s"case $i failed to parse: <$rendered>\n$e")
        }
      // null-safe pointwise agreement (three-valued logic included)
      Seq(sum(when(parsed <=> colBo(ast), 0L).otherwise(1L))
        .as(s"bad$i"))
    }
    val row = df.agg(cols.head, cols.tail: _*).collect().head
    val bad = cases.indices.filter(i => row.getLong(i) != 0L)
    if (bad.nonEmpty) {
      val i = bad.head
      fail(s"case $i disagrees on ${row.getLong(i)} rows: <${cases(i)._2}>")
    }
  }
}
