package graft

import graft.functions.{CastOptions, Casts, TimeFns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.scalatest.funsuite.AnyFunSuite

/** The compiled timedelta/complex parse kernels must agree byte-for-
  * byte with the Column cascades they replaced (which the DuckDB
  * oracle SQL is generated from). */
class ParseKernelsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val tdGrid = Seq(
    "1:30:00", "2:15", "1h30m", "2 days 4h", "1.5h", "-0:00:30.5", "90",
    "+90", "-90", "1w2d3:04:05.678", "3w", "2d", "1h", "30m", "45s",
    "500ms", "250us", "1d2h3m4s5ms6us", "-1d12:00", "0:00", "0:00:00",
    "1.5 hours", "2 minutes", "90 seconds", "3 weeks", "1 day",
    "250 microseconds", "500 milliseconds", "2 mins", "4 hrs", "1 wk",
    "", "abc", "1:99:00", "12:34:56.789012", "+1w", "-3w2d",
    "1H30M", " 1h 30m ", "1.25d", "0.5m", "we1rd", "..", "1:2",
    "10:2:3", "-:30", "1e3", "99999999:59:59")

  test("timedelta kernel == Column cascade on the full grid (both as_hours modes)") {
    for (asHours <- Seq(false, true)) {
      val df = tdGrid.toDF("s").select(
        TimeFns.timedeltaMicros($"s", asHours).as("k"),
        TimeFns.timedeltaMicrosColumns($"s", asHours).as("c"))
      df.collect().zip(tdGrid).foreach { case (r, s) =>
        assert(r.isNullAt(0) == r.isNullAt(1) &&
          (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
          s"'$s' asHours=$asHours: kernel=${r.get(0)} cascade=${r.get(1)}")
      }
    }
  }

  private val zGrid = Seq(
    "1+2j", "-1.5-2.5j", "3j", "-j", "+j", "j", "2.5", "(1+2j)", "(3j)",
    "(2.5)", "1.5e2+2e-1j", "-0.5j", ".5+.5j", "1.", "+.5", "-1.5e-3",
    "1e3j", "e5j", "nope", "", "1 + 2j", "i", "2i", "(1+2i)", "--1j",
    "1+2", "(1+2j", "3.14")

  test("complex kernel matches the regex cascade's semantics on the grid") {
    // the cascade was removed from the hot path — reconstruct it here
    // from the SAME public pattern strings as the differential oracle
    val v = trim($"s")
    val bothRe = Casts.complexBothRe
    val imRe = Casts.complexImRe
    val reRe = Casts.complexReRe
    val imCoeff = regexp_extract(v, imRe, 1)
    val imVal = when(imCoeff.isin("", "+"), lit(1.0))
      .when(imCoeff === "-", lit(-1.0))
      // try_cast: under ANSI the old cascade THREW on mantissa-less
      // coefficients like "e5j"; the kernel's null is the coerce-mode
      // semantics the cast machinery wants
      .otherwise(imCoeff.try_cast("double"))
    val cascade = when(v.rlike(bothRe), struct(
        regexp_extract(v, bothRe, 1).cast("double").as("re"),
        regexp_extract(v, bothRe, 2).cast("double").as("im")))
      .when(v.rlike(imRe), struct(lit(0.0).as("re"), imVal.as("im")))
      .when(v.rlike(reRe), struct(
        regexp_extract(v, reRe, 1).cast("double").as("re"), lit(0.0).as("im")))
    val df = zGrid.toDF("s").select(
      Casts.toComplex($"s", StringType, CastOptions(errors = "coerce")).as("k"),
      cascade.as("c"))
    df.select($"k.re", $"k.im", $"c.re", $"c.im").collect().zip(zGrid).foreach {
      case (r, s) =>
        assert(r.get(0) == r.get(2) && r.get(1) == r.get(3),
          s"'$s': kernel=(${r.get(0)},${r.get(1)}) cascade=(${r.get(2)},${r.get(3)})")
    }
  }

  test("kernel pattern strings are pinned to the public oracle-template patterns") {
    import graft.expressions.{ComplexKernel, TimedeltaKernel}
    assert(TimedeltaKernel.clockReStr == TimeFns.clockRe)
    assert(TimedeltaKernel.secReStr == TimeFns.secRe)
    assert(TimedeltaKernel.abbrevReStr == TimeFns.abbrevRe)
    assert(TimedeltaKernel.replacements == TimeFns.tdReplacements)
    assert(ComplexKernel.bothReStr == Casts.complexBothRe)
    assert(ComplexKernel.imReStr == Casts.complexImRe)
    assert(ComplexKernel.reReStr == Casts.complexReRe)
  }
}

class UnicodeNormalizeSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("precomposed and decomposed accent forms normalize to the same bytes") {
    import graft.expressions.TextNormKernel.normalize
    val precomposed = "Caf\u00e9 Z\u00fcrich" // single code points
    val decomposed = "Cafe\u0301 Zu\u0308rich" // combining marks
    assert(precomposed != decomposed) // genuinely different byte forms
    assert(normalize(precomposed) == "cafe zurich")
    assert(normalize(decomposed) == "cafe zurich")
    assert(normalize("  AÑO\t nuevo \n") == "ano nuevo") // case+ws collapse
    assert(normalize("plain ascii") == "plain ascii")
  }
}
