package graft

import graft.functions._
import graft.types._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeResolverSpec extends AnyFunSuite {
  test("aliases resolve to canonical specs") {
    assert(TypeResolver.resolve("?") == GBoolean)
    assert(TypeResolver.resolve("i8") == GInteger(64))
    assert(TypeResolver.resolve("int8") == GInteger(8))
    assert(TypeResolver.resolve("u4") == GInteger(32, signed = false))
    assert(TypeResolver.resolve("half") == GFloat(16))
    assert(TypeResolver.resolve("NA") == GMissing)
  }
  test("parameterized + decorator specs round-trip") {
    for (spec <- Seq("decimal(10,2)", "sparse[int64, 0]", "categorical[string]",
        "sparse[categorical[int8]]", "datetime[US/Pacific]"))
      assert(TypeResolver.resolve(TypeResolver.resolve(spec).spec).spec ==
        TypeResolver.resolve(spec).spec, spec)
  }
  test("datetime tz preserves case") {
    assert(TypeResolver.resolve("datetime[UTC]").spec == "datetime[UTC]")
  }
  test("unknown spec raises") {
    intercept[IllegalArgumentException](TypeResolver.resolve("wibble"))
  }
  test("uint carried in wider signed spark types") {
    assert(TypeResolver.resolve("uint8").sparkType == ShortType)
    assert(TypeResolver.resolve("uint64").sparkType == DecimalType(20, 0))
  }

  test("custom type registration: the reference's 10-line tutorial") {
    // reference README doctest: @register class CustomType with aliases
    // {"foo","bar"}, then resolve_type("foo") and aliases.add("baz")
    import org.apache.spark.sql.functions._
    TypeRegistry.register(
      GCustom("custom", StringType, "custom"),
      aliases = Seq("foo", "bar"),
      caster = Some(c => upper(c)))
    try {
      assert(TypeResolver.resolve("foo").spec == "custom")
      assert(TypeResolver.resolve("BAR").spec == "custom")
      TypeRegistry.addAlias("foo", "baz")
      assert(TypeResolver.resolve("baz").spec == "custom")
      // decorator composition over a custom type
      assert(TypeResolver.resolve("sparse[foo]").spec == "sparse[custom]")
      // the registered cast kernel is live in Column.castTo
      import graft.syntax._
      import TestSpark.spark.implicits._
      val got = Seq("hi").toDF("s").select($"s".castTo("foo")).as[String].head()
      assert(got == "HI")
    } finally Seq("foo", "bar", "baz").foreach(TypeRegistry.unregister)
  }

  test("unregistered alias resolves no more") {
    intercept[IllegalArgumentException](TypeResolver.resolve("foo"))
  }
}

class RoundingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val cases = Seq(2.5, -2.5, 3.5, -3.5, 2.4, -2.4, 2.6, -2.6, 0.0, 7.0)

  test("roundFloat matches BigDecimal reference for all rules") {
    import java.math.RoundingMode
    val modes = Map(
      "floor" -> RoundingMode.FLOOR, "ceiling" -> RoundingMode.CEILING,
      "down" -> RoundingMode.DOWN, "up" -> RoundingMode.UP,
      "half_down" -> RoundingMode.HALF_DOWN, "half_up" -> RoundingMode.HALF_UP,
      "half_even" -> RoundingMode.HALF_EVEN)
    val df = cases.toDF("x")
    for ((rule, mode) <- modes) {
      val got = df.select(Rounding.roundFloat($"x", rule).as("r"))
        .collect().map(_.getDouble(0)).toSeq
      val want = cases.map(v =>
        new java.math.BigDecimal(v).setScale(0, mode).doubleValue())
      assert(got == want, s"rule=$rule got=$got want=$want")
    }
  }

  test("half_floor / half_ceiling tie directions") {
    val df = cases.toDF("x")
    val hf = df.select(Rounding.roundFloat($"x", "half_floor").as("r"))
      .collect().map(_.getDouble(0)).toSeq
    val hc = df.select(Rounding.roundFloat($"x", "half_ceiling").as("r"))
      .collect().map(_.getDouble(0)).toSeq
    assert(hf(0) == 2.0 && hf(1) == -3.0) // 2.5→2, -2.5→-3
    assert(hc(0) == 3.0 && hc(1) == -2.0) // 2.5→3, -2.5→-2
  }

  test("roundDiv matches Math.floorDiv/ceil reference incl. negatives") {
    val pairs = for (a <- Seq(-7L, -6L, -1L, 0L, 1L, 6L, 7L, 9L); b <- Seq(2L, 3L, -2L))
      yield (a, b)
    val df = pairs.toDF("a", "b")
    val gotFloor = df.select(Rounding.roundDiv($"a", $"b", "floor")).as[Long].collect().toSeq
    assert(gotFloor == pairs.map { case (a, b) => Math.floorDiv(a, b) })
    val gotCeil = df.select(Rounding.roundDiv($"a", $"b", "ceiling")).as[Long].collect().toSeq
    assert(gotCeil == pairs.map { case (a, b) => -Math.floorDiv(-a, b) })
    val gotHalfEven = df.select(Rounding.roundDiv($"a", $"b", "half_even")).as[Long].collect().toSeq
    val wantHalfEven = pairs.map { case (a, b) =>
      BigDecimal(a).bigDecimal.divide(BigDecimal(b).bigDecimal, 0,
        java.math.RoundingMode.HALF_EVEN).longValueExact()
    }
    assert(gotHalfEven == wantHalfEven)
  }

  test("snap only moves values within tolerance") {
    val df = Seq(1.99, 2.2, 2.31, -0.05).toDF("x")
    val got = df.select(Rounding.snap($"x", 0.3).as("r")).as[Double].collect().toSeq
    assert(got == Seq(2.0, 2.0, 2.31, 0.0))
  }
}

class CastsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("toBoolean coerce + custom tokens") {
    val df = Seq("yes", " NO ", "maybe", "1", "off").toDF("s")
    val got = df.select(Casts.toBoolean($"s", StringType,
      CastOptions(errors = "coerce")).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(got == Seq(Some(true), Some(false), None, Some(true), Some(false)))
    val custom = df.select(Casts.toBoolean($"s", StringType,
      CastOptions(errors = "coerce", trueTokens = Seq("maybe"),
        falseTokens = Seq("yes"))).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getBoolean(0))).toSeq
    assert(custom == Seq(Some(false), None, Some(true), None, None))
  }

  test("toBoolean raise throws on bad token") {
    val df = Seq("nope-not-bool").toDF("s")
    val ex = intercept[Exception] {
      df.select(Casts.toBoolean($"s", StringType).as("b")).collect()
    }
    assert(ex.getMessage.contains("graft.cast") ||
      ex.getCause != null && ex.getCause.getMessage.contains("graft.cast"))
  }

  test("toInteger overflow coerces to null, in-range passes") {
    val df = Seq(127.4, 128.0, -129.0, 12.5).toDF("x")
    val got = df.select(Casts.toInteger($"x", DoubleType, GInteger(8),
      CastOptions(rounding = Some("half_even"), errors = "coerce")).as("i"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getByte(0))).toSeq
    assert(got == Seq(Some(127.toByte), None, None, Some(12.toByte)))
  }

  test("toInteger without rounding enforces tolerance") {
    val df = Seq(5.0000001, 5.4).toDF("x")
    val got = df.select(Casts.toInteger($"x", DoubleType, GInteger(64),
      CastOptions(errors = "coerce", tol = 1e-3)).as("i"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(Some(5L), None))
  }

  test("toInteger coerces NaN/Infinity/overflow to null under ANSI") {
    val df = Seq(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1e300, 5.0).toDF("x")
    val got = df.select(Casts.toInteger($"x", DoubleType, GInteger(64),
      CastOptions(rounding = Some("half_even"), errors = "coerce")).as("i"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(None, None, None, None, Some(5L)))
  }

  test("toInteger coerces over-long digit strings to null under ANSI") {
    val df = Seq("99999999999999999999999", "42").toDF("s")
    val got = df.select(Casts.toInteger($"s", StringType, GInteger(64),
      CastOptions(errors = "coerce")).as("i"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    assert(got == Seq(None, Some(42L)))
  }

  test("toDecimal coerces out-of-precision to null under ANSI") {
    val df = Seq(1e20, 12.34).toDF("x")
    val got = df.select(Casts.toDecimal($"x", DoubleType, GDecimal(10, 2),
      CastOptions(errors = "coerce")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDecimal(0).toString)).toSeq
    assert(got == Seq(None, Some("12.34")))
  }

  test("toInteger parses base-16 strings") {
    val df = Seq("ff", "10").toDF("s")
    val got = df.select(Casts.toInteger($"s", StringType, GInteger(64),
      CastOptions(base = 16, errors = "coerce")).as("i")).as[Long].collect().toSeq
    assert(got == Seq(255L, 16L))
  }

  test("toDatetime unit/since roundtrip") {
    val df = Seq(60L).toDF("v")
    val got = df.select(unix_micros(Casts.toDatetime($"v", LongType,
      CastOptions(unit = "m", since = "2024-01-01 00:00:00"))).as("us"))
      .as[Long].collect().head
    assert(got == 1704067200000000L + 3600L * 1000000L)
  }
}

class DowncastSpec extends AnyFunSuite {
  import TestSpark._

  test("plan picks narrowest lossless types on lineitem") {
    val li = Tables.t(spark, sf, "lineitem")
    val plan = Downcast.plan(li,
      Seq("l_linenumber", "l_quantity", "l_extendedprice")).map(p => p._1 -> p._4).toMap
    assert(plan("l_linenumber") == "int8")
    assert(plan("l_quantity") == "int8") // integral doubles 1..50
    assert(plan("l_extendedprice") == "float64") // fractional, f32-lossy
  }

  test("apply narrows the physical schema") {
    val li = Tables.t(spark, sf, "lineitem")
    val out = Downcast(li, Seq("l_linenumber", "l_quantity"))
    assert(out.schema("l_linenumber").dataType == ByteType)
    assert(out.schema("l_quantity").dataType == ByteType)
  }
}

class DetectSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("content inference on string columns") {
    val df = Seq(
      ("1", "1.5", "true", "2024-01-01", "hello"),
      ("-42", "2", "no", "2024-02-03 04:05:06", "3.5"),
    ).toDF("i", "f", "b", "d", "s")
    val got = Detect.detectTypes(df).toMap
    assert(got == Map("i" -> "int64", "f" -> "float64", "b" -> "bool",
      "d" -> "datetime", "s" -> "string"))
  }

  test("all-null string column detects as missing") {
    val df = Seq.fill(3)(Option.empty[String]).toDF("x")
    assert(Detect.detectTypes(df) == Seq("x" -> "missing"))
  }

  test("typecheck family match + mismatch") {
    val df = Seq((1L, "abc")).toDF("k", "v")
    val res = Detect.typecheck(df, Seq("k" -> "int32", "v" -> "bool"))
    assert(res.find(_._1 == "k").get._4) // int64 vs int32: same family → ok
    assert(!res.find(_._1 == "v").get._4)
  }
}
