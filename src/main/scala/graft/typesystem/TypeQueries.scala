package graft.typesystem

import graft.Tables._
import graft.functions._
import graft.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY §2 T1–T19: the reference's own type-system surface
  * (detect/resolve/typecheck/cast/round/downcast/missing/categorical/
  * sparse/calendar/complex/mixed), exercised over the shared test
  * tables with DuckDB-oracle parity. */
object TypeQueries {

  // ---- T1: detect_type ----------------------------------------------------
  def t1Detect(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders").select(
      col("o_orderkey").cast(StringType).as("s_int"),
      col("o_totalprice").cast(StringType).as("s_float"),
      when(col("o_orderkey") % 2 === 0, "yes").otherwise("no").as("s_bool"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("s_date"),
      col("o_orderpriority").as("s_str"),
      col("o_orderkey").as("phys_long"),
      col("o_totalprice").as("phys_double"))
    import s.implicits._
    Detect.detectTypes(src).toDF("col_name", "detected").orderBy("col_name")
  }

  // ---- T2: resolve_type mini-language ------------------------------------
  def t2Resolve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val specs = Seq("bool", "?", "i8", "uint16", "float32", "half",
      "decimal(10,2)", "datetime[UTC]", "sparse[int, 0]",
      "categorical[string]", "sparse[categorical[int8]]", "str",
      "object", "NA", "complex64", "timedelta",
      "int | float", "bool | sparse[int8]",
      // structured/named unions (reference meta.py:1278): bare pairs,
      // the Union[...] wrapper, per-field unions, comma unions, and
      // flattening of a nested union member
      "foo: int32",
      "foo: int32 | int64, bar: bool",
      "Union[foo: categorical[string], bar: decimal]",
      "int8, uint32",
      "Union[int16, int32 | int64]")
    specs.map(sp => (sp, TypeResolver.resolve(sp).spec,
        TypeResolver.resolve(sp).family))
      .toDF("spec", "canonical", "family").orderBy("spec")
  }

  // ---- T3: typecheck -------------------------------------------------------
  def t3Typecheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val declared = Seq(
      "l_orderkey" -> "int64", "l_linenumber" -> "int32",
      "l_quantity" -> "int64", // fails: data is float64
      "l_returnflag" -> "bool", // fails: strings aren't bool tokens
      "l_shipdate" -> "datetime", "l_linestatus" -> "string")
    Detect.typecheck(t(s, dir, "lineitem"), declared)
      .toDF("col_name", "expected", "actual", "ok").orderBy("col_name")
  }

  // ---- T4: to_integer with rounding / overflow-coerce ---------------------
  def t4CastInt(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 200)
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      Casts.toInteger(col("l_quantity"), DoubleType, GInteger(8),
        CastOptions(rounding = Some("half_even"), errors = "coerce")).as("qty_i8"),
      Casts.toInteger(col("l_extendedprice"), DoubleType, GInteger(32),
        CastOptions(rounding = Some("floor"), errors = "coerce")).as("price_i32"),
      Casts.toInteger(col("l_extendedprice"), DoubleType, GInteger(8),
        CastOptions(rounding = Some("half_up"), errors = "coerce")).as("price_i8"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- T5: to_boolean with token sets -------------------------------------
  def t5CastBool(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "orders").select(
      when(col("o_orderstatus") === "F", "yes")
        .when(col("o_orderstatus") === "O", " NO ") // trims + case-folds
        .otherwise("maybe").as("raw"))
    val b = Casts.toBoolean(col("raw"), StringType, CastOptions(errors = "coerce"))
    raw.select(b.as("b"))
      .agg(count(when(col("b") === true, 1)).as("n_true"),
        count(when(col("b") === false, 1)).as("n_false"),
        count(when(col("b").isNull, 1)).as("n_null"))
  }

  // ---- T6: string→numeric parse with errors='coerce' ----------------------
  def t6CastStringNum(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "lineitem").select(
      when(col("l_linenumber") % 4 === 0, col("l_extendedprice").cast(StringType))
        .when(col("l_linenumber") % 4 === 1,
          concat(lit("  "), col("l_quantity").cast(StringType), lit(" ")))
        .when(col("l_linenumber") % 4 === 2, lit("N/A"))
        .otherwise(concat(lit("$"), col("l_extendedprice").cast(StringType)))
        .as("raw"))
    val parsed = Casts.toFloat(col("raw"), StringType, GFloat(64),
      CastOptions(errors = "coerce"))
    raw.select(parsed.as("v"))
      .agg(count(col("v")).as("n_parsed"),
        count(when(col("v").isNull, 1)).as("n_failed"),
        dsum(dec(col("v"))).as("total"))
  }

  // ---- T7: int→datetime with unit + since epoch ---------------------------
  def t7CastDatetime(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).filter(col("event_id") < 100)
      .select(col("event_id"), unix_timestamp(col("ts")).as("es"))
    e.select(col("event_id"), col("es"),
      unix_micros(Casts.toDatetime(col("es"), LongType,
        CastOptions(unit = "s"))).as("us_epoch"),
      unix_micros(Casts.toDatetime(col("es"), LongType,
        CastOptions(unit = "m", since = "2024-01-01 00:00:00"))).as("us_minutes"))
      .orderBy("event_id")
  }

  // ---- T8: timedelta units ------------------------------------------------
  def t8CastTimedelta(s: SparkSession, dir: String): DataFrame = {
    val anchor = lit("1995-01-01 00:00:00").cast(TimestampType)
    t(s, dir, "orders").filter(col("o_orderkey") <= 300)
      .select(col("o_orderkey"),
        TimeFns.diff(anchor, col("o_orderdate"), "days").as("d_days"),
        TimeFns.diff(anchor, col("o_orderdate"), "weeks").as("d_weeks"),
        TimeFns.diff(anchor, col("o_orderdate"), "hours").as("d_hours"),
        Casts.toTimedelta(TimeFns.diff(anchor, col("o_orderdate"), "days"),
          LongType, CastOptions(unit = "days")).as("td_us"))
      .orderBy("o_orderkey")
  }

  // ---- T9: float→decimal exact --------------------------------------------
  def t9CastDecimal(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 300)
    // Output surfaced as DOUBLE: the cast itself runs in exact decimal
    // arithmetic (the point of T9), but DECIMAL result columns render
    // differently across the driver's pandas/pyarrow bridges (trailing
    // zeros, HUGEINT-style coercion), so hash-compare on the final double.
    o.select(col("o_orderkey"),
      Casts.toDecimal(col("o_totalprice"), DoubleType, GDecimal(18, 2))
        .cast(DoubleType).as("price_dec"),
      (Casts.toDecimal(col("o_totalprice"), DoubleType, GDecimal(18, 2)) * lit(2))
        .cast(DecimalType(20, 2)).cast(DoubleType).as("price_x2"))
      .orderBy("o_orderkey")
  }

  // ---- T10: 9 float rounding rules ----------------------------------------
  def t10RoundRules(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 100)
    val x = (col("l_extendedprice") *
      when(col("l_linenumber") % 2 === 0, -1.0).otherwise(1.0)).as("x")
    val ruleCols = Rounding.validRules.map(r =>
      Rounding.roundFloat(col("x"), r, 1).as(s"r_$r"))
    li.select((Seq(col("l_orderkey"), col("l_linenumber"), x)): _*)
      .select(Seq(col("l_orderkey"), col("l_linenumber"), col("x")) ++ ruleCols: _*)
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- T11: integer round_div rules ---------------------------------------
  def t11RoundDiv(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity").cast(LongType) *
          when(col("l_linenumber") % 2 === 0, -1L).otherwise(1L)).as("a"),
        col("l_linenumber").cast(LongType).as("b"))
    val ruleCols = Rounding.validRules.map(r =>
      Rounding.roundDiv(col("a"), col("b"), r).as(s"q_$r"))
    li.select(Seq(col("l_orderkey"), col("l_linenumber"), col("a"), col("b")) ++ ruleCols: _*)
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- T12: tolerance snap -------------------------------------------------
  def t12Snap(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_id") < 200)
      .select(col("event_id"), col("value"),
        Rounding.snap(col("value"), 0.3).as("snapped"))
      .orderBy("event_id")

  // ---- T13: downcast plan --------------------------------------------------
  def t13Downcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount")
    Downcast.plan(t(s, dir, "lineitem"), cols)
      .toDF("col_name", "lo", "hi", "target").orderBy("col_name")
  }

  // ---- T14: missing-value semantics ---------------------------------------
  def t14Missing(s: SparkSession, dir: String): DataFrame = {
    val withNa = t(s, dir, "lineitem")
      .select(when(col("l_quantity") > 45, null).otherwise(col("l_quantity")).as("q"))
    withNa.agg(
      count(lit(1)).as("n"),
      count(when(col("q").isNull, 1)).as("n_null"),
      count(col("q")).as("n_valid"),
      dsum(dec(coalesce(col("q"), lit(0.0)))).as("sum_filled"),
      (sum(dec(col("q"))).cast(DoubleType) / count(col("q"))).as("avg_skipna"))
  }

  // ---- T15: categorical dictionary encode ---------------------------------
  // dictionary from Categorical.fit (range-partitioned sort +
  // zipWithIndex — no single-partition window), broadcast onto the
  // aggregated counts
  def t15Categorical(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val counts = li.groupBy(col("l_returnflag").as("value"))
      .agg(count(lit(1)).as("n"))
    val dict = graft.operators.Categorical.fit(li, "l_returnflag")
    counts.join(broadcast(dict), Seq("value"))
      .select("value", "code", "n").orderBy("code")
  }

  // ---- T16: sparse run-length encode (partition-parallel islands) ---------
  def t16Sparse(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).filter(col("event_id") < 2000)
      .select(col("event_id"), col("event_type"))
    graft.operators.RunLength.encode(e, "event_id", "event_type")
      .select(col("value"), col("start_key").as("start_id"), col("run_len"))
      .orderBy("start_id")
  }

  // ---- T17: calendar math --------------------------------------------------
  def t17TimeUnits(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderkey") <= 200)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        TimeFns.dowSunday0(col("o_orderdate")).as("dow"),
        TimeFns.daysInMonth(col("o_orderdate")).as("dim"),
        TimeFns.isLeapYear(year(col("o_orderdate"))).as("leap"),
        TimeFns.dateToOrdinal(col("o_orderdate")).as("ord"),
        // ordinal → date → ordinal roundtrip proves days_to_date
        TimeFns.dateToOrdinal(
          TimeFns.ordinalToDate(TimeFns.dateToOrdinal(col("o_orderdate"))))
          .as("ord_rt"))
      .orderBy("o_orderkey")

  // ---- T18: complex as struct<re,im> --------------------------------------
  def t18Complex(s: SparkSession, dir: String): DataFrame = {
    val z = struct(col("c_acctbal").as("re"),
      col("c_custkey").cast(DoubleType).as("im"))
    t(s, dir, "customer")
      .select(col("c_custkey"), z.as("z"))
      .select(col("c_custkey"),
        (col("z.re") * 2.0 + col("z.im")).as("prod_re"), // z * (2 - i)
        (col("z.im") * 2.0 - col("z.re")).as("prod_im"),
        sqrt(col("z.re") * col("z.re") + col("z.im") * col("z.im")).as("modulus"))
      .orderBy("c_custkey")
  }

  // ---- T19: mixed-type column, split-apply-combine ------------------------
  def t19MixedSac(s: SparkSession, dir: String): DataFrame = {
    val mixed = t(s, dir, "lineitem").select(
      when(col("l_linenumber") % 3 === 0, col("l_extendedprice").cast(StringType))
        .when(col("l_linenumber") % 3 === 1,
          col("l_quantity").cast(IntegerType).cast(StringType))
        .otherwise(when(col("l_returnflag") === "R", "true").otherwise("false"))
        .as("raw"))
    // fused classify+parse: one compiled scan per row instead of four
    // regex-engine evaluations (int/float rlike, token isin, and the
    // coercing cast's own rlike) — same grammar, same oracle
    val cls = {
      import org.apache.spark.sql.graft.ColumnBridge
      ColumnBridge.column(graft.expressions.ClassifyNumeric(
        ColumnBridge.expression(col("raw"))))
    }
    mixed.select(cls.as("c")) // staged: both fields read from one eval
      .select(col("c.subtype").as("subtype"), col("c.v").as("v"))
      .groupBy("subtype")
      .agg(count(lit(1)).as("n"), dsum(dec(col("v"))).as("total"))
      .orderBy("subtype")
  }

  // ---- T20: round_decimal, exact decimal arithmetic -----------------------
  def t20RoundDecimal(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        (dec(col("l_extendedprice")) *
          when(col("l_linenumber") % 2 === 0, -1).otherwise(1)).as("x"))
    val ruleCols = Rounding.validRules.map(r =>
      Rounding.roundDecimal(col("x"), r, 1).cast(DoubleType).as(s"d_$r"))
    li.select(Seq(col("l_orderkey"), col("l_linenumber"),
      col("x").cast(DoubleType).as("x")) ++ ruleCols: _*)
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- T21: calendar units (M/Y), step_size, named epochs -----------------
  // reference util/time/unit.pyx:65,231,263 (M/Y in valid_units,
  // round_months/years_to_ns), convert/arguments.py:554 (step_size),
  // epoch.pyx:22 (named anchors)
  def t21UnitCalendar(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        (col("o_orderkey") % 480).cast(IntegerType).as("nm"),
        (col("o_orderkey") % 40).cast(IntegerType).as("ny"))
    val tsM = Casts.toDatetime(col("nm"), IntegerType,
      CastOptions(unit = "M", since = "sas"))
    val tsY = Casts.toDatetime(col("ny"), IntegerType,
      CastOptions(unit = "Y", since = "utc"))
    val tsQ = Casts.toDatetime(col("nm"), IntegerType,
      CastOptions(unit = "M", since = "reduced julian", stepSize = 3))
    val tsL = Casts.toDatetime(col("nm"), IntegerType,
      CastOptions(unit = "M", since = "lotus")) // day 30: exercises EOM clamping
    val tsS5 = Casts.toDatetime(col("nm"), IntegerType,
      CastOptions(unit = "s", since = "gps", stepSize = 5))
    o.select(col("o_orderkey"), col("nm"), col("ny"),
        unix_seconds(tsM).as("ts_m"),
        unix_seconds(tsY).as("ts_y"),
        unix_seconds(tsQ).as("ts_q"),
        unix_seconds(tsL).as("ts_l"),
        unix_seconds(tsS5).as("ts_s5"),
        TimeFns.calendarUnitsSince(tsM, 1, "sas").as("m_rt"),
        TimeFns.calendarUnitsSince(tsY, 12, "utc").as("y_rt"))
      .orderBy("o_orderkey")
  }

  /** Deterministic string fixtures for t22, indexed by key modulo. */
  private[typesystem] val tdForms = Seq("1:30:00", "2:15", "1h30m", "2 days 4h",
    "1.5h", "90", "-0:00:30.5", "1w", "250ms", "3d1:00:00", "12 minutes",
    "nonsense")
  private[typesystem] val zForms = Seq("1+2j", "-1.5-2.5j", "3j", "-j", "2.5",
    "(1-1j)", "1e2+0.5j", "+4.25i", "oops")

  // ---- T22: timedelta + complex parsed from strings -----------------------
  // reference util/time/timedelta.pyx:136 (timedelta_regex families),
  // convert/base.py:234 + convert/complex.py (string → complex)
  def t22ParseStrings(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        element_at(array(tdForms.map(lit): _*),
          (col("o_orderkey") % tdForms.size).cast(IntegerType) + 1).as("td_s"),
        element_at(array(zForms.map(lit): _*),
          (col("o_orderkey") % zForms.size).cast(IntegerType) + 1).as("z_s"))
    val z = Casts.toComplex(col("z_s"), StringType, CastOptions(errors = "coerce"))
    o.select(col("o_orderkey"), col("td_s"), col("z_s"),
        Casts.toTimedelta(col("td_s"), StringType,
          CastOptions(errors = "coerce")).as("td_us"),
        z.getField("re").as("z_re"), z.getField("im").as("z_im"))
      .orderBy("o_orderkey")
  }

  // ---- T23: string→datetime parse grid ------------------------------------
  // reference convert/datetime.py (string paths in util/string.pyx),
  // arguments.py:761 (tz), :859 (day_first), :921 (year_first).
  // Fixture strings are FORMATTED from o_orderdate by both engines
  // (date_format vs strftime), then parsed back through every option:
  // default ISO, explicit format, dayFirst, yearFirst, wall-clock tz,
  // and errors=coerce on planted junk. yearFirst uses dates shifted
  // +360 months (2022-2028): Java's "yy" maps to 2000-2099 while
  // DuckDB's %y splits at 69, so the grid stays where both agree.
  def t23ParseDatetime(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 400)
      .select(col("o_orderkey"),
        col("o_orderdate").cast(TimestampType).as("d"),
        add_months(col("o_orderdate"), 360).cast(TimestampType).as("d30"))
    val fix = o.select(col("o_orderkey"),
      date_format(col("d"), "yyyy-MM-dd HH:mm:ss").as("iso_s"),
      date_format(col("d"), "MM/dd/yyyy").as("us_s"),
      date_format(col("d"), "dd/MM/yyyy").as("df_s"),
      date_format(col("d30"), "yy/MM/dd").as("yf_s"),
      when(col("o_orderkey") % 3 === 0, lit("not a date"))
        .otherwise(date_format(col("d"), "yyyy-MM-dd")).as("mixed_s"))
    fix.select(col("o_orderkey"), col("iso_s"),
      unix_micros(Casts.toDatetime(col("iso_s"), StringType)).as("us_iso"),
      unix_micros(Casts.toDatetime(col("us_s"), StringType,
        CastOptions(format = Some("M/d/yyyy")))).as("us_fmt"),
      unix_micros(Casts.toDatetime(col("df_s"), StringType,
        CastOptions(dayFirst = true))).as("us_dayfirst"),
      unix_micros(Casts.toDatetime(col("yf_s"), StringType,
        CastOptions(yearFirst = true))).as("us_yearfirst"),
      unix_micros(Casts.toDatetime(col("iso_s"), StringType,
        CastOptions(tz = Some("America/New_York")))).as("us_tz"),
      unix_micros(Casts.toDatetime(col("mixed_s"), StringType,
        CastOptions(errors = "coerce"))).as("us_coerce"))
      .orderBy("o_orderkey")
  }

  // ---- T24: to_string incl. int→radix, and the radix round-trip -----------
  // reference convert/base.py:274 (to_string), util/string.pyx:45
  // (int_to_base: lowercase digits, explicit sign)
  def t24ToString(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") <= 500)
      .select(col("o_orderkey"),
        (col("o_orderkey") *
          when(col("o_orderkey") % 2 === 1, -1).otherwise(1)).as("v"),
        col("o_orderdate").cast(TimestampType).as("d"))
    o.select(col("o_orderkey"), col("v"),
      Casts.toString(col("v"), LongType, CastOptions(base = 16)).as("hex_s"),
      Casts.toString(col("v"), LongType, CastOptions(base = 2)).as("bin_s"),
      Casts.toString(col("v"), LongType, CastOptions(base = 8)).as("oct_s"),
      Casts.toString(col("o_orderkey") % 2 === 0, BooleanType).as("bool_s"),
      Casts.toString(col("d"), TimestampType).as("ts_s"),
      Casts.toInteger(
        Casts.toString(col("v"), LongType, CastOptions(base = 16)),
        StringType, GInteger(64), CastOptions(base = 16)).as("rt"))
      .orderBy("o_orderkey")
  }

  // ---- T25: object dtype — tagged-string store + dispatch round-trip ------
  // reference types/object.py: the object dtype carries heterogeneous
  // values; SURVEY §3 maps it to a string-serialized store with
  // per-value dispatch. Values of four subtypes serialize to
  // "tag:payload" strings, then each row dispatches to its subtype's
  // cast kernel and the decoded value is checked against the original
  // (rt_ok) — a full serialize → detect → dispatch → decode round-trip.
  def t25ObjectRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").filter(col("l_orderkey") <= 300)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_returnflag"),
        col("l_shipdate").cast(TimestampType).as("sd"))
    val tagged = li.withColumn("obj",
      when(col("l_linenumber") % 4 === 0,
        concat(lit("int:"), col("l_orderkey").cast(StringType)))
      .when(col("l_linenumber") % 4 === 1,
        concat(lit("float:"), col("l_extendedprice").cast(StringType)))
      .when(col("l_linenumber") % 4 === 2,
        concat(lit("bool:"),
          when(col("l_returnflag") === "R", "true").otherwise("false")))
      .otherwise(concat(lit("datetime:"),
        date_format(col("sd"), "yyyy-MM-dd HH:mm:ss"))))
    val co = CastOptions(errors = "coerce")
    val split = tagged
      .withColumn("tag", substring_index(col("obj"), ":", 1))
      // payload = everything after the FIRST ':' (datetime payloads
      // contain colons themselves)
      .withColumn("payload", expr("substring(obj, instr(obj, ':') + 1)"))
    split.select(col("l_orderkey"), col("l_linenumber"), col("tag"),
        when(col("tag") === "int",
          Casts.toInteger(col("payload"), StringType, GInteger(64), co)).as("v_int"),
        when(col("tag") === "float",
          Casts.toFloat(col("payload"), StringType, GFloat(64), co)).as("v_float"),
        when(col("tag") === "bool",
          Casts.toBoolean(col("payload"), StringType, co).cast(IntegerType)).as("v_bool"),
        when(col("tag") === "datetime",
          unix_micros(Casts.toDatetime(col("payload"), StringType, co))).as("v_ts_us"),
        when(col("tag") === "int",
            Casts.toInteger(col("payload"), StringType, GInteger(64), co) === col("l_orderkey"))
          .when(col("tag") === "float",
            Casts.toFloat(col("payload"), StringType, GFloat(64), co) === col("l_extendedprice"))
          .when(col("tag") === "bool",
            (Casts.toBoolean(col("payload"), StringType, co).cast(IntegerType) === 1) ===
              (col("l_returnflag") === "R"))
          .otherwise(
            unix_micros(Casts.toDatetime(col("payload"), StringType, co)) ===
              unix_micros(col("sd"))).as("rt_ok"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  // ---- T26: sparse fill-aware compute on the compressed form --------------
  // reference types/sparse.py: arithmetic acts on sparse storage
  // without densifying. Encode event codes to RLE, apply v*2+1 to the
  // O(runs) triples, fold all aggregates from (value, run_len) — the
  // oracle computes the same numbers from the DENSE rows, so a match
  // proves compressed-form compute ≡ dense semantics (incl. the
  // gaps-and-islands run count).
  def t26SparseCompute(s: SparkSession, dir: String): DataFrame = {
    val code = when(col("event_type") === "click", 0)
      .when(col("event_type") === "view", 1)
      .when(col("event_type") === "purchase", 2)
      .when(col("event_type") === "signup", 3)
      .otherwise(4).cast(LongType)
    val e = events(s, dir).filter(col("event_id") < 5000)
      .select(col("event_id"), code.as("v"))
    val rle = graft.operators.RunLength.encode(e, "event_id", "v")
    val mapped = graft.operators.RunLength.mapValues(rle, v => v * 2 + 1)
    // fill tracks the same op: sparse[long, 0] * 2 + 1 → fill 1
    graft.operators.RunLength.aggregatesFromRuns(mapped, lit(1L))
  }

  // ---- T27: one-pass column profiling -------------------------------------
  /** describe-style stats for heterogeneous columns in ONE aggregation
    * pass (graft.types.Profile): the data-quality sweep a pipeline
    * runs before choosing casts/filters. */
  def t27Profile(s: SparkSession, dir: String): DataFrame =
    graft.types.Profile.profile(t(s, dir, "documents"),
      Seq("doc_id", "lang", "source", "n_chars"))

  // ---- T28: end-to-end typed ingestion ------------------------------------
  /** GraftReader's whole pipeline on a simulated raw feed: orders
    * rendered as ALL-STRINGS (the phase-1 read), then content-inferred
    * and coercively cast back (phase 2). The oracle is the ORIGINAL
    * typed table — passing proves inference picked int64/float64/
    * datetime/string correctly AND that every cast round-trips
    * losslessly (shortest-roundtrip double render, ISO datetime). */
  def t28IngestInfer(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "orders").select(
      col("o_orderkey").cast(StringType).as("k"),
      col("o_totalprice").cast(StringType).as("price"),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("ts"),
      col("o_orderpriority").as("prio"))
    graft.sources.GraftReader.inferAndCast(raw)
      .orderBy("k")
  }

  // ---- T29: errors="ignore" (whole-column semantics) ----------------------
  /** The reference's `errors="ignore"` is COLUMN-level: any
    * unconvertible value keeps the whole column unchanged. k_good (all
    * parseable) casts to int64; k_bad (odd keys get an 'x' suffix)
    * comes back verbatim as strings. */
  def t29CastIgnore(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "orders").select(
      col("o_orderkey"),
      col("o_orderkey").cast(StringType).as("k_good"),
      concat(col("o_orderkey").cast(StringType),
        when(col("o_orderkey") % 2 === 1, "x").otherwise("")).as("k_bad"))
    val cast = (c: Column) =>
      Casts.toInteger(c, StringType, GInteger(64), CastOptions(errors = "coerce"))
    val step = Casts.castColumnOrKeep(raw, "k_good", cast)
    Casts.castColumnOrKeep(step, "k_bad", cast)
      .orderBy("o_orderkey")
  }

  // ---- T30: linear interpolation of missing values ------------------------
  /** pandas `Series.interpolate(method='index')` re-expressed per
    * group: interior nulls get the linear blend of the nearest non-null
    * neighbors (x = o_orderkey, the index); leading/trailing nulls stay
    * null (strict interpolation — the fill variants are t14's surface).
    * Reference: NA semantics in types/missing.py; positional fill in
    * convert/base.py. Scale posture: two frame-bounded IGNORE NULLS
    * windows per key partition — one shuffle on the group key, no
    * self-joins; the blend itself is pure codegen'd arithmetic. */
  def t30Interpolate(s: SparkSession, dir: String): DataFrame = {
    val src = t(s, dir, "orders").select(
      col("o_custkey").as("g"),
      col("o_orderkey").as("x"),
      when(col("o_orderkey") % 5 < 2, lit(null).cast(DoubleType))
        .otherwise(col("o_totalprice")).as("v"))
    val wPrev = Window.partitionBy("g").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy("g").orderBy("x")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val xOrNull = when(col("v").isNotNull, col("x"))
    src
      .withColumn("y0", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("x0", last(xOrNull, ignoreNulls = true).over(wPrev))
      .withColumn("y1", first(col("v"), ignoreNulls = true).over(wNext))
      .withColumn("x1", first(xOrNull, ignoreNulls = true).over(wNext))
      .select(col("g"), col("x"),
        when(col("v").isNotNull, col("v"))
          .when(col("y0").isNull || col("y1").isNull, lit(null).cast(DoubleType))
          .otherwise(col("y0") +
            (col("y1") - col("y0")) * (col("x") - col("x0")) / (col("x1") - col("x0")))
          .as("v_interp"),
        col("v").isNull.as("was_null"))
      .orderBy("g", "x")
  }

  // ---- T31: cut / qcut binning -------------------------------------------
  /** pandas `cut` (8 equal-width bins) and `qcut` (quartiles) over
    * events.value via [[graft.functions.Binning]]; verified through
    * per-bin count + min/max + decimal-exact sum, which any
    * misassigned row would break. Edges ride along as one broadcast
    * stats row; assignment is a map expression. */
  def t31CutQcut(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("value"))
    def agg(binned: DataFrame, kind: String): DataFrame = binned
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"),
        max(col("value")).as("vmax"), dsum(dec(col("value"))).as("total"))
      .select(lit(kind).as("kind"), col("bin"), col("n"), col("vmin"),
        col("vmax"), col("total"))
    agg(graft.functions.Binning.cut(e, "value", 8), "cut")
      .union(agg(graft.functions.Binning.qcut(e, "value", 4), "qcut"))
      .orderBy("kind", "bin")
  }

  // ---- T32: melt / unpivot (wide → long) ----------------------------------
  /** pandas `melt` via Spark's NATIVE `unpivot` (Spark 3.4+): four
    * lineitem measures go long as (variable, value) with the id vars
    * riding along. Values are cast to the common double type first
    * (exactly pandas' coercion). Scale shape: unpivot is a generate —
    * a map-side row-expansion, no shuffle at all; the deterministic
    * id-filter keeps this test's output bounded. */
  def t32Melt(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .filter(col("l_orderkey") % 20 === 0)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast(DoubleType).as("l_quantity"),
        col("l_extendedprice").cast(DoubleType).as("l_extendedprice"),
        col("l_discount").cast(DoubleType).as("l_discount"),
        col("l_tax").cast(DoubleType).as("l_tax"))
    li.unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax")),
        "variable", "value")
      .orderBy("l_orderkey", "l_linenumber", "variable")
  }

  // ---- T33: rank methods --------------------------------------------------
  /** pandas `Series.rank(method=...)` — all four tie policies plus
    * `pct` in ONE window pass over the same partition key (Spark fuses
    * same-spec windows; the tie-group count is a second spec on the
    * same key, still one shuffle): `min` = RANK, `dense` = DENSE_RANK,
    * `first` = ROW_NUMBER with the id tiebreak, `average` = min +
    * (ties − 1)/2 (the mean of the tie positions, provably), `pct` =
    * average/n (pandas' default). Heavy-tie input (integer p_size
    * within p_mfgr) so every policy actually diverges. */
  def t33RankMethods(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("p_brand").orderBy("p_size")
    val wFirst = Window.partitionBy("p_brand").orderBy("p_size", "p_partkey")
    t(s, dir, "part")
      .withColumn("r_min", rank().over(w))
      .withColumn("r_dense", dense_rank().over(w))
      .withColumn("r_first", row_number().over(wFirst))
      .withColumn("ties",
        count(lit(1)).over(Window.partitionBy("p_brand", "p_size")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("p_brand")))
      .select(col("p_partkey"), col("p_brand"), col("p_size"),
        col("r_min").cast(LongType).as("r_min"),
        col("r_dense").cast(LongType).as("r_dense"),
        col("r_first").cast(LongType).as("r_first"),
        (col("r_min") + (col("ties") - 1) / 2.0).as("r_avg"),
        round((col("r_min") + (col("ties") - 1) / 2.0) / col("n"), 6)
          .as("r_pct"))
      .orderBy("p_partkey")
  }

  // ---- T34: shift / diff / pct_change / cumulative ------------------------
  /** The pandas time-series accessor quartet per user in event-time
    * order: `shift(1)`, `diff()`, `pct_change()`, `cumsum()`/`cummax()`.
    * One partition-key shuffle serves every column (all windows share
    * the (user) key); sums are decimal-exact, pct_change is pure IEEE
    * double division (identical in both engines), first-row results
    * are null exactly as pandas produces NaN. */
  def t34ShiftDiff(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"), dec(col("value")).as("v"))
      .withColumn("v_prev", lag("value", 1).over(w))
      .select(col("user_id"), col("es"), col("event_id"),
        col("v_prev"),
        (dec(col("value")) - dec(col("v_prev"))).cast(DoubleType).as("diff"),
        // zero base → null on BOTH engines (ANSI Spark would raise on
        // /0; DuckDB would emit inf): the NULLIF-pinned semantics.
        // No ROUND — the raw division is IEEE-identical cross-engine,
        // and 6-dp rounding tie-breaks differently (the t44 lesson)
        when(col("v_prev") === 0.0, lit(null))
          .otherwise(col("value") / col("v_prev") - 1.0).as("pct_change"),
        sum(col("v")).over(wCum).cast(DoubleType).as("cum_sum"),
        max(col("value")).over(wCum).as("cum_max"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T35: string accessor grid -------------------------------------------
  /** The pandas `.str` accessor surface in one pass — case flips,
    * `zfill`/`pad`, slice, `strip(chars)`, `contains`/`startswith`,
    * regex `extract`, `split().get`, `repeat`, `len`, `replace` — all
    * native codegen'd `functions._` (zero UDFs, embarrassingly
    * parallel, pushdown-transparent). Reference: the string-kernel
    * surface of util/string.pyx, cast-adjacent accessors. */
  def t35StrAccessor(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(col("c_custkey"),
        upper(col("c_name")).as("nm_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        reverse(col("c_name")).as("nm_rev"),
        lpad(col("c_custkey").cast(StringType), 9, "0").as("key_zfill"),
        rpad(col("c_mktsegment"), 12, ".").as("seg_pad"),
        substring(col("c_name"), 1, 4).as("nm_slice"),
        col("c_mktsegment").contains("I").as("seg_has_i"),
        col("c_name").startsWith("Customer").as("nm_is_cust"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("nm_digits"),
        ltrim(regexp_extract(col("c_name"), "([0-9]+)", 1), "0")
          .as("nm_digits_stripped"),
        element_at(split(col("c_name"), "#"), 2).as("nm_after_hash"),
        repeat(substring(col("c_mktsegment"), 1, 2), 3).as("seg_echo"),
        length(col("c_name")).cast(LongType).as("nm_len"),
        regexp_replace(col("c_name"), "^Customer", "Cust").as("nm_short"))
      .orderBy("c_custkey")

  // ---- T36: nested-array / higher-order function grid ---------------------
  /** The list-column surface (pandas object-of-list / Spark ArrayType):
    * per-order quantity vectors built with a sorted collect, then the
    * full higher-order lambda family — `aggregate` (fold), `filter`,
    * `exists`, `transform` — plus positional access and render. All
    * Catalyst lambda expressions: codegen'd, no UDFs, and the
    * nondeterministic collect_list order is neutralized by array_sort
    * BEFORE anything order-sensitive reads it (the determinism
    * discipline for array state). One partition-key shuffle total. */
  def t36ArrayOps(s: SparkSession, dir: String): DataFrame = {
    val per = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_list(col("l_quantity").cast(IntegerType)))
        .as("qs"))
    per.select(col("l_orderkey"),
        array_join(col("qs"), ",").as("qs_str"),
        size(col("qs")).as("n_items"),
        aggregate(col("qs"), lit(0L), (acc, x) => acc + x).as("q_sum"),
        size(filter(col("qs"), x => x > 25)).as("n_big"),
        exists(col("qs"), x => x === 50).as("has_50"),
        array_join(transform(col("qs"), x => x * 2), ",").as("doubled"),
        element_at(col("qs"), 1).as("q_min"),
        element_at(col("qs"), -1).as("q_max"))
      .orderBy("l_orderkey")
  }

  // ---- T37: groupby().transform broadcast z-score --------------------------
  /** pandas `groupby().transform` — a group statistic joined back onto
    * every member row WITHOUT a window: the per-group (n, Σv, Σv²)
    * moments aggregate exactly (decimals), broadcast back (group
    * cardinality rows), and the z-score is a pure map expression. At
    * 100 TB this is the only shape that works — a window would sort
    * the fact table; the broadcast join costs one tiny exchange.
    * Every double op ((s, sq) casts → mean/var/sqrt/divide) is the
    * identical IEEE sequence in the oracle, so z matches bit-exact
    * before the display round. */
  def t37GroupTransform(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_id"), col("event_type"),
      col("value"), dec(col("value")).as("v"))
    val stats = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("v")).as("s_dec"),
      sum((col("v") * col("v")).cast(DecimalType(34, 4))).as("sq_dec"))
    val withStats = e.join(broadcast(stats), Seq("event_type"))
      .withColumn("s", col("s_dec").cast(DoubleType))
      .withColumn("sq", col("sq_dec").cast(DoubleType))
      .withColumn("mean", col("s") / col("n"))
      .withColumn("variance",
        (col("sq") - col("s") * col("s") / col("n")) / col("n"))
    withStats.select(col("event_id"), col("event_type"),
        col("value"),
        round((col("value") - col("mean")) / sqrt(col("variance")), 6)
          .as("z"),
        (abs((col("value") - col("mean")) / sqrt(col("variance"))) > 2)
          .as("outlier"))
      .orderBy("event_id")
  }

  // ---- T38: drop_duplicates keep grid --------------------------------------
  /** pandas `drop_duplicates(subset, keep=first/last/False)` — all
    * three keep policies over the natural (user, event_type) duplicate
    * groups, "first/last" pinned by (time, id). One partition-key
    * shuffle serves all three (two orderings + one count on the same
    * key); keep=False is the count==1 filter, which no single window
    * rank can express. */
  def t38DropDuplicates(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"), col("event_id"))
    val wf = Window.partitionBy("user_id", "event_type")
      .orderBy(col("es").asc, col("event_id").asc)
    val wl = Window.partitionBy("user_id", "event_type")
      .orderBy(col("es").desc, col("event_id").desc)
    val wc = Window.partitionBy("user_id", "event_type")
    val ranked = e
      .withColumn("rf", row_number().over(wf))
      .withColumn("rl", row_number().over(wl))
      .withColumn("cnt", count(lit(1)).over(wc))
    ranked.filter(col("rf") === 1)
        .select(lit("first").as("policy"), col("user_id"),
          col("event_type"), col("event_id"))
      .union(ranked.filter(col("rl") === 1)
        .select(lit("last").as("policy"), col("user_id"),
          col("event_type"), col("event_id")))
      .union(ranked.filter(col("cnt") === 1)
        .select(lit("unique").as("policy"), col("user_id"),
          col("event_type"), col("event_id")))
      .orderBy("policy", "user_id", "event_type")
  }

  // ---- T42: one-hot encoding ----------------------------------------------
  /** pandas `get_dummies` over a low-cardinality categorical: one 0/1
    * indicator column per level (levels pinned, not discovered — the
    * t15 categorical-code contract), plus `drop_first` shown by
    * omitting the first level from a second projection stage is
    * unnecessary — the indicators are pure map expressions, zero
    * shuffles, and downstream models consume them columnar. */
  def t42GetDummies(s: SparkSession, dir: String): DataFrame = {
    val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val inds = pr.zipWithIndex.map { case (v, i) =>
      when(col("o_orderpriority") === v, 1).otherwise(0).as(s"pr_$i")
    }
    t(s, dir, "orders")
      .select(col("o_orderkey") +: col("o_orderpriority") +: inds: _*)
      .orderBy("o_orderkey")
  }

  // ---- T43: clip / where / mask / between ---------------------------------
  /** The pandas elementwise guard grid — `clip(lower, upper)`,
    * `where(cond, other)`, `mask(cond, other)`, `between(a, b)`,
    * `abs()` — over order totals, all as native codegen'd expressions
    * in ONE map pass (no UDFs, no shuffle). Money math stays decimal
    * until the final double surface. */
  def t43ClipWhere(s: SparkSession, dir: String): DataFrame = {
    val v = col("o_totalprice")
    t(s, dir, "orders")
      .select(col("o_orderkey"), v.as("price"),
        least(greatest(v, lit(50000.0)), lit(200000.0)).as("clipped"),
        when(v >= 100000.0, v).otherwise(lit(-1.0)).as("where_hi"),
        when(v >= 100000.0, lit(-1.0)).otherwise(v).as("mask_hi"),
        v.between(80000.0, 120000.0).as("in_band"),
        abs(v - 150000.0).as("dist_150k"))
      .orderBy("o_orderkey")
  }

  // ---- T41: merge indicator -----------------------------------------------
  /** pandas `merge(how='outer', indicator=True)` — the `_merge`
    * provenance column (`both` / `left_only` / `right_only`) computed
    * from key nullability on a FULL OUTER join (the right side is
    * filtered to every 3rd customer and the left to every 4th order
    * so all three verdicts actually materialize). One key shuffle; the indicator is a pure
    * projection. Sort keys are nulls-first-pinned on both engines so
    * the right_only block (null o_orderkey) orders deterministically
    * by its own key. */
  def t41MergeIndicator(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") % 4 === 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val c = t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey"), col("c_mktsegment"))
    o.join(c, col("o_custkey") === col("c_custkey"), "full_outer")
      .select(col("o_orderkey"), col("o_custkey"), col("c_custkey"),
        col("c_mktsegment"),
        when(col("o_custkey").isNotNull && col("c_custkey").isNotNull,
            "both")
          .when(col("o_custkey").isNotNull, "left_only")
          .otherwise("right_only").as("merge_ind"))
      .orderBy(asc_nulls_first("o_orderkey"), asc_nulls_first("c_custkey"))
  }

  // ---- T40: timezone localize/convert -------------------------------------
  /** pandas `tz_localize('UTC').tz_convert(zone)` — the tz-aware
    * datetime surface: each event instant rendered as New York and
    * Kolkata wall-clock time plus the realized UTC offset in minutes.
    * Events are spread across 365 synthetic days (event_id-keyed, so
    * deterministic) to cross BOTH US DST transitions — the NY offset
    * column takes −300 and −240 on different rows — and Kolkata pins
    * the half-hour (+330) case. Instant→local is total (no ambiguous/
    * nonexistent local times on this direction), both engines resolve
    * zones from IANA tzdata, and the map pass is pure projection — no
    * shuffle. */
  def t40Timezone(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("event_id"), unix_timestamp(col("ts")).as("es0"))
      .withColumn("es", col("es0") + (col("event_id") % 365) * 86400L)
      .withColumn("utc", to_timestamp(col("es")))
    def local(zone: String): Column = from_utc_timestamp(col("utc"), zone)
    def offMin(zone: String): Column =
      ((unix_timestamp(local(zone)) - col("es")) / 60).cast("int")
    val fmt = "yyyy-MM-dd HH:mm:ss"
    e.select(col("event_id"), col("es"),
        date_format(col("utc"), fmt).as("utc_str"),
        date_format(local("America/New_York"), fmt).as("ny_str"),
        offMin("America/New_York").as("ny_offset_min"),
        date_format(local("Asia/Kolkata"), fmt).as("kolkata_str"),
        offMin("Asia/Kolkata").as("kolkata_offset_min"))
      .orderBy("event_id")
  }

  // ---- T39: crosstab with margins -----------------------------------------
  /** pandas `pd.crosstab(priority, status, margins=True)` + the
    * `normalize='index'` companion in one result: wide counts per
    * (priority × status), an `All` margin row, a row-total column, and
    * per-cell row shares. ONE groupBy-pivot shuffle builds the wide
    * table (explicit pivot values — no discovery scan); the margin row
    * folds the already-tiny wide frame, costing nothing. Counts are
    * exact longs; shares are one IEEE division washed by round-6. */
  def t39Crosstab(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
    val withTot = wide.select(col("priority"), col("F"), col("O"), col("P"),
      (col("F") + col("O") + col("P")).as("row_total"))
    val margin = withTot.agg(sum("F").as("F"), sum("O").as("O"),
        sum("P").as("P"), sum("row_total").as("row_total"))
      .select(lit("All").as("priority"), col("F"), col("O"), col("P"),
        col("row_total"))
    withTot.union(margin)
      .select(col("priority"), col("F").as("f_cnt"), col("O").as("o_cnt"),
        col("P").as("p_cnt"), col("row_total"),
        round(col("F").cast(DoubleType) / col("row_total"), 6).as("f_share"),
        round(col("O").cast(DoubleType) / col("row_total"), 6).as("o_share"),
        round(col("P").cast(DoubleType) / col("row_total"), 6).as("p_share"))
      .orderBy("priority")
  }

  // ---- T62: pivot_table with values + margins ------------------------------
  /** pandas `pivot_table(index=returnflag, columns=linestatus,
    * values=extendedprice, aggfunc=['sum','mean'], margins=True)` —
    * the VALUES generalization of t39's count crosstab, completing
    * the reshaping family: per cell an exact DECIMAL-cents sum
    * (BIGINT at the boundary — the integer-cents device) and a mean
    * derived by the pinned t48 division sequence (cents → /n → /100),
    * plus BOTH margin axes (the `All` column per row, the `All` row
    * per column, and the grand cell). ONE groupBy-pivot shuffle with
    * EXPLICIT level lists (no discovery scan — the t15/t42 code
    * contract); margins fold the already-tiny wide frame, so the
    * fact table is read once. Empty cells: count 0, sum 0, mean null
    * (pandas NaN). */
  def t62PivotTable(s: SparkSession, dir: String): DataFrame = {
    val wide = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("rf"), col("l_linestatus").as("ls"),
        (dec(col("l_extendedprice")) * 100).cast(LongType).as("c"))
      .groupBy("rf").pivot("ls", Seq("F", "O"))
      .agg(sum("c").as("sc"), count(lit(1)).as("n"))
      .na.fill(0L, Seq("F_sc", "F_n", "O_sc", "O_n"))
    val withAll = wide.select(col("rf"), col("F_sc"), col("F_n"),
      col("O_sc"), col("O_n"),
      (col("F_sc") + col("O_sc")).as("all_sc"),
      (col("F_n") + col("O_n")).as("all_n"))
    val margin = withAll.agg(sum("F_sc").as("F_sc"), sum("F_n").as("F_n"),
        sum("O_sc").as("O_sc"), sum("O_n").as("O_n"),
        sum("all_sc").as("all_sc"), sum("all_n").as("all_n"))
      .select(lit("All").as("rf"), col("F_sc"), col("F_n"), col("O_sc"),
        col("O_n"), col("all_sc"), col("all_n"))
    def mean(sc: Column, n: Column): Column =
      when(n > 0, sc.cast(DoubleType) / n / lit(100.0))
    withAll.union(margin)
      .select(col("rf"), col("F_sc").as("f_sum_cents"), col("F_n").as("f_n"),
        mean(col("F_sc"), col("F_n")).as("f_mean"),
        col("O_sc").as("o_sum_cents"), col("O_n").as("o_n"),
        mean(col("O_sc"), col("O_n")).as("o_mean"),
        col("all_sc").as("all_sum_cents"), col("all_n").as("all_n"),
        mean(col("all_sc"), col("all_n")).as("all_mean"))
      .orderBy("rf")
  }

  // ---- T44: exponentially weighted mean ------------------------------------
  /** pandas `ewm(alpha=0.3, adjust=False).mean()` per user in
    * event-time order: y₁ = x₁, yₜ = 0.7·yₜ₋₁ + 0.3·xₜ — a sequential
    * left fold the oracle replays with the identical IEEE op sequence
    * (DuckDB `list_reduce`), so every prefix value is bit-exact.
    *
    * Scale shape: ONE partition-key shuffle (`groupByKey`) and a
    * single O(n) streamed pass per key — the recurrence carries one
    * double of state, so a 100k-event key costs 100k multiply-adds,
    * not the O(n²) of per-row prefix re-folds. The fold is inherently
    * sequential per key but keys parallelize freely; were a single
    * key ever to exceed executor memory, the associative (mult, add)
    * pair formulation (Blelloch '90 segmented scan) splits it. */
  def t44Ewm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long, Long, Double)]) =>
        // one ordered pass per key: the recurrence yₜ = 0.7·yₜ₋₁ + 0.3·xₜ
        // is O(n) streamed, not O(n²) prefix re-folds; group state is one
        // double, the sort buffer is the group itself (bounded per key)
        val evs = it.toArray.sortBy(e => (e._2, e._3, e._4))
        var acc = 0.0
        var first = true
        evs.iterator.map { e =>
          acc = if (first) { first = false; e._4 } else acc * 0.7 + e._4 * 0.3
          (uid, e._3, e._4, acc)
        }
      }
      .toDF("user_id", "event_id", "value", "ewm")
      .orderBy("user_id", "event_id")
  }

  // ---- T45: rolling mean / std ---------------------------------------------
  /** pandas `rolling(3).mean()` / `rolling(3).std()` (sample, ddof=1,
    * min_periods = window) per user in event-time order. The frame is
    * spelled as explicit lags — value + lag1 + lag2 — so the
    * accumulation ORDER is pinned (a window SUM's internal order is an
    * engine choice); null lags make the first two rows null exactly as
    * pandas yields NaN. Variance via the sums-of-squares identity with
    * a 0-clamp for float negatives; every op IEEE-identical in the
    * oracle. One partition-key shuffle serves both lags. */
  def t45RollingStd(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val sum3 = col("value") + col("l1") + col("l2")
    val ssq = col("value") * col("value") + col("l1") * col("l1") +
      col("l2") * col("l2")
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"))
      .withColumn("l1", lag("value", 1).over(w))
      .withColumn("l2", lag("value", 2).over(w))
      .select(col("user_id"), col("es"), col("event_id"), col("value"),
        (sum3 / lit(3.0)).as("roll_mean"),
        when(col("l1").isNull || col("l2").isNull, lit(null))
          .otherwise(sqrt(greatest(lit(0.0),
            (ssq - sum3 * sum3 / lit(3.0)) / lit(2.0)))).as("roll_std"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T52: rolling median / min / max -----------------------------------
  /** pandas `rolling(3, min_periods=3).median()/.min()/.max()` per user
    * under t45's lag-pinned discipline (one window shuffle serves every
    * column). The 3-element median needs NO sort and NO arithmetic:
    * median(a,b,c) = max(min(a,b), min(max(a,b), c)) — a pure
    * SELECTION network (the sum−max−min identity would NOT be exact:
    * the IEEE sum rounds, and that rounding leaks into the result),
    * so the output is bit-for-bit one of the inputs, like pandas.
    * Warm-up rows are explicit nulls (the t45 guard — Spark's
    * greatest/least SKIP nulls, so the inner expressions never decide
    * the null rows on either engine). */
  def t52RollingMedian(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val med = greatest(least(col("value"), col("l1")),
      least(greatest(col("value"), col("l1")), col("l2")))
    val mx = greatest(col("value"), col("l1"), col("l2"))
    val mn = least(col("value"), col("l1"), col("l2"))
    val warm = col("l1").isNull || col("l2").isNull
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"))
      .withColumn("l1", lag("value", 1).over(w))
      .withColumn("l2", lag("value", 2).over(w))
      .select(col("user_id"), col("es"), col("event_id"), col("value"),
        when(warm, lit(null)).otherwise(med).as("roll_med"),
        when(warm, lit(null)).otherwise(mn).as("roll_min"),
        when(warm, lit(null)).otherwise(mx).as("roll_max"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T53: resample OHLC bars ---------------------------------------------
  /** pandas `groupby('user_id').resample('1D', on='ts')` OHLC + volume
    * bars (`.agg({'value': 'ohlc'})` + count/sum — the time-series
    * downsample read the t44–t52 rolling family doesn't give): open and
    * close are the values at the exact (us, event_id) MIN / MAX pairs,
    * read back from ONE mergeable min/max-struct aggregation (t51's
    * pinning device — no window ever touches the events, no second
    * pass); high/low are plain min/max; volume is an exact DECIMAL sum
    * (order-free at any partitioning). One groupBy shuffle with map-side
    * partials; per-(user, day) state is two structs + four scalars — the
    * mergeable semigroup shape that folds in streaming (S19 twin).
    * Bucket surfaced as epoch seconds (q23 convention). */
  def t53ResampleOhlc(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("user_id"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .groupBy("user_id", "day_s")
      .agg(
        min(struct(col("us"), col("event_id"), col("value"))).as("o"),
        max(struct(col("us"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        dsum(dec(col("value"))).as("volume"), count(lit(1)).as("n_ticks"))
      .select(col("user_id"), col("day_s"), col("o.value").as("open"),
        col("high"), col("low"), col("c.value").as("close"),
        col("volume"), col("n_ticks"))
      .orderBy("user_id", "day_s")

  // ---- T54: json_normalize (nested record-path flatten) --------------------
  /** pandas `json_normalize(data, record_path='items', meta=[['user',
    * 'id'], ['user', 'tier']])` — the NESTED semi-structured flatten
    * q34's flat props extract doesn't exercise: each event carries a
    * planted two-level JSON document (user object + items array of
    * objects, every value derived from row columns), parsed by
    * `from_json` with an explicit nested schema (codegen'd — no schema
    * inference scan), then the record path explodes positionally and
    * the meta fields broadcast down onto each item row. The oracle
    * recomputes every field arithmetically from the source columns
    * (the m-family device), so a hash match proves the build → parse →
    * flatten round-trip exact. Map + generate only — zero shuffles
    * (output-proportional explode), pmod/floor pinned on both engines
    * so negative values can't split truncation semantics. */
  def t54JsonNormalize(s: SparkSession, dir: String): DataFrame = {
    val qty1 = pmod(floor(col("value")).cast("long"), lit(5)) + 1
    val qty2 = pmod(col("event_id"), lit(7)) + 1
    val json = concat(
      lit("{\"user\":{\"id\":"), col("user_id"),
      lit(",\"tier\":\"t"), pmod(col("user_id"), lit(3)),
      lit("\"},\"items\":[{\"sku\":"), col("event_id"),
      lit(",\"qty\":"), qty1,
      lit("},{\"sku\":"), col("event_id") + 1,
      lit(",\"qty\":"), qty2, lit("}]}"))
    val schema = StructType(Seq(
      StructField("user", StructType(Seq(
        StructField("id", LongType), StructField("tier", StringType)))),
      StructField("items", ArrayType(StructType(Seq(
        StructField("sku", LongType), StructField("qty", LongType)))))))
    events(s, dir)
      .select(col("event_id"), from_json(json, schema).as("j"))
      .select(col("event_id"), col("j.user.id").as("uid"),
        col("j.user.tier").as("tier"),
        posexplode(col("j.items")).as(Seq("item_pos", "it")))
      .select(col("event_id"), col("uid"), col("tier"),
        col("item_pos").cast(IntegerType).as("item_pos"),
        col("it.sku").as("sku"), col("it.qty").as("qty"))
      .orderBy("event_id", "item_pos")
  }

  // ---- T55: frame compare (cell-level diff) --------------------------------
  /** pandas `df.compare(other)` — the CELL-level diff (which column of
    * which row changed, old vs new) that q43's row-digest CDC labels
    * don't give: both snapshots unpivot to (key, column, value) via
    * Spark's native `unpivot` (a generate — zero extra shuffles), join
    * on (key, column), and only null-safe-differing cells survive.
    * Prices compare as exact integer CENTS rendered to strings (a
    * float→string render differs across engines; integers don't).
    * Plants: price bumps on k%11==1, priority tags on k%13==2 — both
    * fire together every lcm, so multi-cell rows exist. One (k, col)
    * join shuffle, output-proportional. */
  def t55FrameCompare(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").select(col("o_orderkey").as("k"),
      (dec(col("o_totalprice")) * 100).cast(LongType).as("cents"),
      col("o_orderpriority").as("pri"), col("o_orderstatus").as("st"))
    val old = o.select(col("k"), col("cents").cast(StringType).as("price"),
      col("pri").as("priority"), col("st").as("status"))
    val nw = o.select(col("k"),
      (col("cents") + when(col("k") % 11 === 1, 100L).otherwise(0L))
        .cast(StringType).as("price"),
      when(col("k") % 13 === 2, concat(col("pri"), lit("-X")))
        .otherwise(col("pri")).as("priority"),
      col("st").as("status"))
    def melt(df: DataFrame, vName: String): DataFrame =
      df.unpivot(Array(col("k")),
        Array(col("price"), col("priority"), col("status")), "col", vName)
    melt(old, "self_v").join(melt(nw, "other_v"), Seq("k", "col"))
      .filter(!(col("self_v") <=> col("other_v")))
      .orderBy("k", "col")
  }

  // ---- T57: df.query() predicate mini-language -----------------------------
  /** pandas `df.query("...")` — a PINNED predicate grammar
    * (comparisons incl. Python-reading CHAINS `1 <= x < 5`, in/not-in
    * lists, and/or/not with Python precedence plus pandas' `&`/`|`/`~`
    * spellings at those levels, parens, string/number literals,
    * `@name` environment references resolved at parse time, Python's
    * divisor-sign `%`, floor-division `//` and right-associative `**`
    * power, and full
    * arithmetic on BOTH comparison sides so column-vs-column reads
    * are first-class) compiled to Catalyst Columns by
    * [[graft.types.PredicateParser]], the expression-side sibling of
    * t2's type-spec resolver: the same "user strings become plans"
    * front-end discipline, with malformed input throwing (never a
    * silent misread). All grid predicates evaluate in ONE fused
    * corpus scan (per-predicate conditional counts + exact DECIMAL
    * sums on a single aggregation row, x30's device) — the parser
    * produces ordinary codegen'd expressions, so the language costs
    * nothing at runtime. Oracle = the hand-translated SQL WHEREs,
    * certifying the parser's reading against independent semantics. */
  def t57QueryPredicates(s: SparkSession, dir: String): DataFrame = {
    import graft.types.PredicateParser
    // @refs resolve from this env at parse time (pandas' local-scope
    // binding); the oracle hand-inlines the same constants, so the
    // gate certifies the resolution, not just the grammar
    val env = Map[String, Any]("minqty" -> 45L, "flag" -> "R",
      "flags" -> Seq("A", "N"))
    val preds = Seq(
      "l_quantity > 45",
      "l_returnflag == 'R' and l_quantity <= 10",
      "not (l_linestatus == 'O') or l_discount >= 0.08",
      "l_returnflag in ('A', 'N') and l_tax < 0.03",
      "l_extendedprice / l_quantity > 1500 and l_quantity * 2 < 20",
      "l_tax - l_discount > 0.05 or l_quantity + 5 >= 55",
      // env references: scalar comparisons + an in-list from scope
      "l_quantity >= @minqty and l_returnflag == @flag",
      "l_returnflag in @flags and l_quantity < 8",
      // column-vs-column: full arithmetic on BOTH comparison sides
      "l_discount + l_tax > l_quantity / 400",
      // chained comparison (Python's conjunction reading) and the
      // pandas ~/&/not-in spellings
      "5 <= l_quantity < 10",
      "l_returnflag not in ('A', 'N') & ~(l_linestatus == 'F')",
      // Python modulo (divisor-sign result) on a SIGNED dividend, and
      // the power tower: right-assoc '**' binding over unary minus —
      // the constant conjuncts pin the reading against the oracle
      "(l_quantity - 30) % 7 == 3",
      "(l_quantity - 30) // 7 == -2",
      "l_discount ** 2 > 0.006 and l_quantity < 25",
      "2 ** 3 ** 2 == 512 and -2 ** 2 == -4 and l_returnflag == 'R'",
      // NEGATIVE divisor modulo: Python's % takes the divisor's sign
      // both ways ((a % b) + b) % b — the arm pmod would get wrong
      "(l_quantity - 30) % -7 == -4",
      // scientific-notation float literals (Python: 5e-2 and 1.5E3
      // are floats; the tokenizer's exponent extension)
      "l_discount > 5e-2",
      "l_extendedprice >= 1.5E3 and l_quantity < 3",
      // INTEGRAL // and %: both operands integer-typed, so the
      // parser's PyFloorDiv/PyMod kernels take the exact int64 path.
      // 9007199254740993 = 2^53 + 1 is NOT double-representable —
      // the old floor(a/b)-in-double compilation computes
      // (2^53 + 1 + ln) // 3 one short of Python's exact answer for
      // most ln, so these rows certify the exact path, not just
      // retype the old one
      "(9007199254740993 + l_linenumber) // 3 >= 3002399751580332",
      "(-9007199254740993 - l_linenumber) // 3 == -3002399751580332",
      // negative-divisor integral //: floor, not truncate
      // (l_linenumber-10 in [-9,-3]; Python -8 // -3 = 2)
      "(l_linenumber - 10) // -3 == 2",
      // integral % with both divisor signs (divisor-sign result)
      "l_orderkey % 7 == 3 and l_quantity < 30",
      "(l_linenumber - 10) % -3 == -2")
    val li = t(s, dir, "lineitem")
    val aggs = preds.zipWithIndex.flatMap { case (p, i) =>
      val c = PredicateParser.parse(p, env)
      Seq(sum(when(c, 1L).otherwise(0L)).as(s"n$i"),
        sum(when(c, dec(col("l_quantity")))).as(s"q$i"))
    }
    li.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(preds.zipWithIndex.map { case (p, i) =>
        struct(lit(p).as("predicate"), col(s"n$i").as("n_rows"),
          coalesce(col(s"q$i").cast("double"), lit(0.0)).as("qty_total"))
      }: _*)).as("e"))
      .select(col("e.predicate"), col("e.n_rows"), col("e.qty_total"))
      .orderBy("predicate")
  }

  // ---- T70: df.eval multi-statement program --------------------------------
  /** pandas MULTI-LINE `df.eval` as a gated query: a four-statement
    * program whose later statements reference earlier targets (the
    * sequential-withColumn fold of `evalAssign`), exercising the
    * round-11 grammar extensions end-to-end — Python's divisor-sign
    * `%` and the `**` power — against an independent SQL replay.
    * Engine-stability by construction: `bucket` is an integral double
    * (pmod of whole-number quantities), `boost` = 2**bucket is an
    * exact power of two, so `score` = margin × boost is an EXACT
    * binary scaling of the per-row IEEE product — every aggregate is
    * a count, a threshold count (same doubles compared both engines),
    * or an exact decimal sum; no double ever crosses an ordering- or
    * rounding-sensitive path. The program compiles to ordinary
    * codegen'd projections — one corpus scan, one groupBy on a
    * 7-value key. */
  def t70EvalProgram(s: SparkSession, dir: String): DataFrame = {
    import graft.syntax._
    val prog =
      """bucket = l_quantity % 7
        |boost = 2 ** bucket
        |margin = l_extendedprice * (1 - l_discount)
        |score = margin * boost""".stripMargin
    t(s, dir, "lineitem").evalAssign(prog)
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("score") > 200000, 1L).otherwise(0L)).as("n_hi"),
        dsum(dec(col("l_quantity"))).as("sum_qty"))
      .orderBy("bucket")
  }

  // ---- T46: nested decorators — sparse[categorical[string]] ---------------
  /** Decorator COMPOSITION at the data level (reference types/sparse.py
    * wrapping types/categorical.py — `sparse[categorical[T]]`, the
    * recursive decorator stack of meta.py): dictionary-encode
    * event_type (categorical layer: Categorical.fit range-partitioned
    * dictionary, broadcast transform), then run-length-compress the
    * code stream in event_id order (sparse layer: RunLength block-local
    * islands), then peel BOTH layers back off (RLE decode → dictionary
    * inverse) and prove the round-trip restores every row (n_bad = 0
    * per value). Output: per (value, code) the dense row count, the
    * compressed run count, and the round-trip mismatch count.
    *
    * Scale shape: dictionary is distinct-cardinality (broadcast both
    * directions); RLE islands are block-local windows (≤ blockSize rows
    * per task); the verify join is key-equi on the dense keys. */
  def t46SparseCategorical(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Categorical, RunLength}
    val e = events(s, dir).filter(col("event_id") < 2000)
      .select(col("event_id"), col("event_type"))
    val dict = Categorical.fit(e, "event_type")
    val coded = Categorical.transform(e, "event_type", dict)
    val rle = RunLength.encode(coded, "event_id", "event_type")
    // peel the decorators back off: RLE → codes → dictionary values
    val recovered = Categorical.inverse(
      RunLength.decode(rle).withColumnRenamed("value", "ct"), "ct", dict)
    val stats = rle.select(col("value").as("code"),
        col("start_key"), col("run_len"))
      .join(broadcast(dict), Seq("code"))
      .groupBy("value", "code")
      .agg(sum(col("run_len")).as("n_rows"), count(lit(1)).as("n_runs"))
    val rt = e.as("o")
      .join(recovered.as("r"), col("o.event_id") === col("r.k"), "left")
      .groupBy(col("o.event_type").as("value"))
      .agg(sum(when(col("o.event_type") <=> col("r.ct"), 0L)
        .otherwise(1L)).as("n_bad"))
    stats.join(rt, Seq("value"))
      .select("value", "code", "n_rows", "n_runs", "n_bad")
      .orderBy("code")
  }

  // ---- T47: structured-union schema contract ------------------------------
  /** Whole-DataFrame validation against a STRUCTURED (named) union —
    * the reference's schema-contract use of structured unions
    * (meta.py:1278: `df isinstance Union['foo': int, 'bar': bool]`).
    * The grid exercises every status: a per-field union admitting the
    * column, an exact match, a content-level mismatch (float64 data
    * under an int64 contract), a contract field missing from the
    * DataFrame, and a DataFrame column outside the contract (extra —
    * ok, structural subtyping). Detection is ONE aggregation pass
    * (detectTypes); the contract evaluation is driver-side over the
    * per-column summary, the t1/t3 convention. */
  def t47UnionTypecheck(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = t(s, dir, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    Detect.typecheckStruct(df,
        "l_orderkey: int32 | int64, l_quantity: int64, " +
          "l_returnflag: string, l_comment: string")
      .toDF("col_name", "declared", "actual", "status", "ok")
      .orderBy("col_name")
  }

  // ---- T49: rolling correlation / covariance -------------------------------
  /** pandas `rolling(3, min_periods=3).cov(other)` / `.corr(other)`
    * (ddof=1) per user in event-time order, between `value` and a
    * second per-event series (`length(props)` — the natural companion
    * metric on events). The t45 discipline: the 3-row frame is spelled
    * as explicit lags so every accumulation is a PINNED left-to-right
    * IEEE sequence (window-SUM internal order is an engine choice);
    * warm-up rows (any null lag) are null exactly like pandas NaN, and
    * a zero-variance window yields null corr (pandas NaN). Zero
    * variance is detected as the EXACT all-equal window (the only way
    * variance can vanish), not via a float threshold: a float clamp
    * under the sqrt would turn an ulp-negative variance into a 0
    * divisor — ANSI division-by-zero on Spark, inf on DuckDB (the t34
    * crash class); any non-constant window's variance is ≥ ~1e-4
    * (values are 2-dp, lengths integral), far above ulp noise. One
    * partition-key shuffle serves all six lag columns. */
  def t49RollingCorr(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val sx = col("x") + col("x1") + col("x2")
    val sy = col("y") + col("y1") + col("y2")
    val sxy = col("x") * col("y") + col("x1") * col("y1") +
      col("x2") * col("y2")
    val sxx = col("x") * col("x") + col("x1") * col("x1") +
      col("x2") * col("x2")
    val syy = col("y") * col("y") + col("y1") * col("y1") +
      col("y2") * col("y2")
    val cov = (sxy - sx * sy / lit(3.0)) / lit(2.0)
    val varx = sxx - sx * sx / lit(3.0)
    val vary = syy - sy * sy / lit(3.0)
    val xConst = col("x") === col("x1") && col("x1") === col("x2")
    val yConst = col("y") === col("y1") && col("y1") === col("y2")
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value").as("x"),
        length(col("props")).cast(DoubleType).as("y"))
      .withColumn("x1", lag("x", 1).over(w))
      .withColumn("x2", lag("x", 2).over(w))
      .withColumn("y1", lag("y", 1).over(w))
      .withColumn("y2", lag("y", 2).over(w))
      .select(col("user_id"), col("es"), col("event_id"),
        when(col("x2").isNull, lit(null)).otherwise(cov).as("roll_cov"),
        when(col("x2").isNull || xConst || yConst, lit(null))
          .otherwise((sxy - sx * sy / lit(3.0)) / sqrt(varx * vary))
          .as("roll_corr"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T48: expanding-window accessor --------------------------------------
  /** pandas `expanding()` accessor per user in event-time order —
    * expanding count / sum / mean / max / std(ddof=1), the
    * unbounded-preceding sibling of t45's bounded rolling frame.
    *
    * Exactness without order-pinning: a running window SUM of doubles
    * depends on accumulation order (engine internals), so the moments
    * accumulate over exact integer CENTS (`value` is DECIMAL(12,2)
    * representable): Σx and Σx² are exact longs at any partitioning,
    * and mean/std derive by a pinned sequence of double divisions —
    * bit-identical cross-engine with NO rounding washes (the t44
    * lesson). The n·Σx² − (Σx)² numerator is computed in DECIMAL(38,0)
    * (its factors exceed int64 past ~10⁹ rows/key); it is ≥ 0 exactly
    * (integer Cauchy-Schwarz), so no clamp is needed — vs t45's float
    * clamp. std is null below 2 observations exactly as pandas NaN
    * (ddof=1). Scale shape: ONE partition-key shuffle; a single
    * Exchange+Sort serves every column. */
  def t48Expanding(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d19 = DecimalType(19, 0)
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"),
        (dec(col("value")) * lit(100)).cast(LongType).as("cents"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sc", sum(col("cents")).over(w))
      .withColumn("scc", sum(col("cents") * col("cents")).over(w))
      .withColumn("exp_max", max(col("value")).over(w))
      .select(col("user_id"), col("es"), col("event_id"), col("n"),
        (col("sc").cast(DoubleType) / col("n") / lit(100.0)).as("exp_mean"),
        (col("sc").cast(DoubleType) / lit(100.0)).as("exp_sum"),
        col("exp_max"),
        when(col("n") < 2, lit(null)).otherwise(sqrt(
          (col("n").cast(d19) * col("scc").cast(d19) -
            col("sc").cast(d19) * col("sc").cast(d19)).cast(DoubleType)
            / (col("n") * (col("n") - 1)).cast(DoubleType)
            / lit(10000.0))).as("exp_std"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T61: expanding skew/kurt --------------------------------------------
  /** pandas `expanding().skew()/.kurt()` per key — the 3rd/4th-moment
    * completion of t48's expanding count/sum/mean/max/std, same
    * discipline: raw power sums Σc..Σc⁴ accumulate over exact integer
    * CENTS (order-insensitive at any partitioning; c⁴ stages c²·c²
    * through DECIMAL since 56021⁴ ≈ 9.9e18 overflows int64), the
    * scale-free integer kernels M2 = nΣc²−(Σc)², M3 = n²Σc³−3nΣcΣc²
    * +2(Σc)³, M4 = n³Σc⁴−4n²ΣcΣc³+6n(Σc)²Σc²−3(Σc)⁴ compute in
    * DECIMAL(38,0) (exact while n·c⁴ holds under 38 digits — ~1e27
    * here; the 100 TB swap is float central-moment accumulation,
    * which is what pandas itself does), and the terminal expressions
    * are pinned IEEE chains of the decimal→double casts:
    * G1 = √(n(n−1))/(n−2) · M3/(M2·√M2) (m2^1.5 via multiply+sqrt —
    * both correctly rounded ops; `pow(x,1.5)` is NOT correctly
    * rounded and may differ 1 ulp across engines) and
    * G2 = (n+1)(n−1)/((n−2)(n−3)) · M4/M2² − 3(n−1)²/((n−2)(n−3)).
    * skew null below 3 obs, kurt below 4, both null at M2 = 0 — an
    * EXACT integer test (the t49 lesson: a float zero-variance clamp
    * is ulp-fragile), matching pandas NaN on constant prefixes.
    * ONE partition-key Exchange+Sort serves every column. */
  def t61ExpandingSkewKurt(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    val base = events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"),
        (dec(col("value")) * lit(100)).cast(LongType).as("c"))
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("s1", sum(col("c")).over(w).cast(d38))
      .withColumn("s2", sum(col("c") * col("c")).over(w).cast(d38))
      .withColumn("s3",
        sum((col("c") * col("c") * col("c")).cast(d38)).over(w).cast(d38))
      .withColumn("s4", sum((col("c") * col("c")).cast(d19) *
        (col("c") * col("c")).cast(d19)).over(w).cast(d38))
    val (m2i, m3i, m4i) = graft.operators.Moments.kernels(
      col("n"), col("s1"), col("s2"), col("s3"), col("s4"))
    base
      .withColumn("m2i", m2i).withColumn("m3i", m3i).withColumn("m4i", m4i)
      .select(col("user_id"), col("es"), col("event_id"), col("n"),
        graft.operators.Moments.g1(col("n"), col("m2i"), col("m3i"))
          .as("exp_skew"),
        graft.operators.Moments.g2(col("n"), col("m2i"), col("m4i"))
          .as("exp_kurt"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T50: robust outliers (median/MAD modified z-score) ----------------
  /** Robust per-group outlier detection — the Iglewicz–Hoaglin modified
    * z-score (0.6745·(x−med)/MAD, flag |z| > 3.5) a curation pipeline
    * reaches for where t37's mean/std z would be dragged by the very
    * outliers it hunts. Two exact interpolating-percentile aggregations
    * (the q32/q50 contract; the t-digest sketch is the documented
    * 100 TB swap): group medians come back as a BROADCAST join for the
    * deviation pass, then MAD medians broadcast for the final map-only
    * scoring — the events table shuffles only into the two group-key
    * aggregations, never sorts globally. z stays an unrounded IEEE
    * chain (Spark `percentile` and DuckDB `quantile_cont` interpolate
    * identically — the t37 discipline); only aggregated outputs round.
    * A degenerate constant group (MAD = 0) yields null z and no flag
    * via NULLIF on both engines. */
  def t50MadOutliers(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_type"), col("value"))
    val med = e.groupBy("event_type")
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .withColumn("z",
        lit(0.6745) * (col("value") - col("med")) / expr("nullif(mad, 0.0d)"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        round(max(col("med")), 6).as("med_value"),
        round(max(col("mad")), 6).as("mad_value"),
        count(when(abs(col("z")) > 3.5, 1)).as("n_outliers"),
        round(max(abs(col("z"))), 6).as("max_abs_z"))
      .orderBy("event_type")
  }

  // ---- T51: factorize + value_counts -------------------------------------
  /** pandas `factorize` + `value_counts(normalize=True)` in one pass:
    * codes are assigned in FIRST-OCCURRENCE order over the
    * (ts, event_id) event order — the appearance-order dictionary
    * (vs t15's rank dictionary), pinned by the exact (first_us,
    * first_event_id) pair from ONE mergeable min-struct aggregation
    * (no window over the events). The ranking/total windows run over
    * the VALUE-cardinality table only — bounded by the dictionary
    * size, never the corpus, so the unpartitioned window is safe at
    * any data scale. share = one IEEE division, identical on both
    * engines. */
  def t51Factorize(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"))
    val agg = e.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      min(struct(col("us"), col("event_id"))).as("first"))
    val w = Window.orderBy(col("first.us"), col("first.event_id"))
    agg.withColumn("code", row_number().over(w) - 1)
      .withColumn("share",
        col("n").cast(DoubleType) / sum(col("n")).over().cast(DoubleType))
      .select(col("event_type"), col("code"), col("n"), col("share"),
        col("first.us").as("first_us"))
      .orderBy("code")
  }

  // ---- T58: business-day calendar arithmetic -------------------------------
  /** pandas `BDay` / `bdate_range` surface (reference
    * `types/datetime.py` calendar offsets): shift every order date by
    * +1/+5/+20 business days and count business days in the next 30
    * calendar days — settlement/SLA math. Both directions are CLOSED
    * FORMS ([[graft.functions.TimeFns.businessDayAdd]] /
    * `businessDaysBetween`): no per-day iteration, a 10-year shift
    * costs the same three integer ops as tomorrow; the weekday index
    * is derived from the epoch ordinal, NOT `dayofweek()` — engines
    * disagree on week-start conventions, (ordinal+3) mod 7 is
    * convention-free. Weekend starts act as the preceding Friday
    * (Sat+1 = Mon, the pandas convention), pinned by the spec's
    * hand-computed calendar grid. One map pass, no shuffle. */
  def t58BusinessDays(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TimeFns
    t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"),
      TimeFns.weekdayIndex(col("o_orderdate")).as("wd"),
      TimeFns.businessDayAdd(col("o_orderdate"), 1).as("bday1"),
      TimeFns.businessDayAdd(col("o_orderdate"), 5).as("bday5"),
      TimeFns.businessDayAdd(col("o_orderdate"), 20).as("bday20"),
      TimeFns.businessDaysBetween(col("o_orderdate"),
        date_add(col("o_orderdate"), 30)).as("bdays_30d"))
      .orderBy("o_orderkey")
  }

  // ---- T56: Kleene three-valued boolean logic ------------------------------
  /** pandas masked-boolean (`BooleanDtype`) Kleene logic — the
    * reference's nullable-bool backend (`types/boolean.py` PandasBool,
    * na_value = pd.NA): AND/OR follow the Kleene table (False ∧ NA =
    * False, True ∨ NA = True, the rest propagate NA), XOR always
    * propagates NA, and the reductions come in both flavors —
    * `any/all(skipna=True)` drop NAs (all-NA ⇒ any=False, all=True),
    * `skipna=False` yield NA whenever a hidden NA could flip the
    * verdict. Spark's SQL ternary logic IS the Kleene table, so the
    * whole grid is one fused scan + mergeable groupBy; the hash match
    * certifies Spark's and DuckDB's three-valued engines agree cell by
    * cell, and the spec pins all 9 cells of each operator against the
    * pandas-documented table.
    *
    * Scale shape: one scan, one groupBy(flag) of conditional counts;
    * strict any/all decide from (bool_or/bool_and, null-count) pairs
    * inside the same aggregation — no second pass, no shuffle beyond
    * the flag key. */
  def t56KleeneBool(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val a = when(col("l_linenumber") % 3 === 0, lit(null).cast("boolean"))
      .otherwise(col("l_quantity") > 30)
    val b = when(col("l_partkey") % 5 === 0, lit(null).cast("boolean"))
      .otherwise(col("l_discount") > 0.05)
    val g = li.select(col("l_returnflag").as("flag"), a.as("a"), b.as("b"))
      .select(col("flag"), col("a"), col("b"),
        (col("a") && col("b")).as("andv"),
        (col("a") || col("b")).as("orv"),
        (col("a") =!= col("b")).as("xorv"))
    def t3(c: Column, name: String): Seq[Column] = Seq(
      count(when(c, 1)).as(s"${name}_t"),
      count(when(!c, 1)).as(s"${name}_f"),
      count(when(c.isNull, 1)).as(s"${name}_n"))
    val aNull = count(when(col("a").isNull, 1))
    val aggs: Seq[Column] = Seq(
      count(lit(1)).as("n"), aNull.as("a_null"),
      count(when(col("b").isNull, 1)).as("b_null")) ++
      t3(col("andv"), "and") ++ t3(col("orv"), "or") ++
      t3(col("xorv"), "xor") ++ Seq(
        coalesce(bool_or(col("a")), lit(false)).as("any_skipna"),
        coalesce(bool_and(col("a")), lit(true)).as("all_skipna"),
        when(coalesce(bool_or(col("a")), lit(false)), "true")
          .when(aNull > 0, "NA").otherwise("false").as("any_strict"),
        when(!coalesce(bool_and(col("a")), lit(true)), "false")
          .when(aNull > 0, "NA").otherwise("true").as("all_strict"))
    g.groupBy("flag").agg(aggs.head, aggs.tail: _*).orderBy("flag")
  }

  // ---- T59: user-registered cast kernel end-to-end --------------------------
  /** The reference's arbitrary-callable conversion hook — `cast(...,
    * call=fn)` (convert/arguments.py:1424) and the `@register` custom
    * type tutorial (types/base docs) — exercised END TO END through the
    * public path: [[TypeRegistry.register]] installs a user type
    * (`t59_money`: dollars → integer cents) with a deliberately coarse
    * first kernel (whole-dollar cents), [[TypeRegistry.overrideCast]]
    * replaces it with the exact-cents kernel (most-recent registration
    * wins — dispatch.py:2453 precedence), and a second registered spec
    * (`t59_clamp50`) carries pure call-semantics a plain type cast
    * can't express. Both columns flow through `Column.castTo`, which
    * consults the registry BEFORE the builtin kernels; a builtin cast
    * rides alongside to show the two paths compose in one projection.
    *
    * Kernels are Column→Column — they inline into the SAME
    * whole-stage-codegen projection as the builtins (registration is a
    * plan-build-time lookup, zero runtime dispatch), so the user hook
    * costs nothing at 100 TB. Registration is idempotent per-JVM;
    * specs are t59-prefixed so the global registry can't collide with
    * other queries. */
  def t59CustomCast(s: SparkSession, dir: String): DataFrame = {
    import graft.syntax._
    // @register: user money type, first with the coarse kernel ...
    TypeRegistry.register(GCustom("t59_money", LongType, "integer"),
      Seq("t59_money"),
      Some(c => (c.cast(DecimalType(12, 0)) * 100).cast(LongType)))
    // ... then cast(call=fn): the exact-cents kernel overrides it
    // (most-recent wins; OverrideCastSpec pins the precedence order).
    TypeRegistry.overrideCast("t59_money",
      c => (c.cast(DecimalType(12, 2)) * 100).cast(LongType))
    // a pure-callable spec: clamp to [0, 50] — not a physical cast
    TypeRegistry.register(GCustom("t59_clamp50", LongType, "integer"),
      Seq("t59_clamp50"),
      Some(c => least(greatest(c, lit(0L)), lit(50L)).cast(LongType)))
    t(s, dir, "orders").select(col("o_orderkey"),
      col("o_totalprice").castTo("t59_money").as("cents"),
      (col("o_orderkey") % 80).castTo("t59_clamp50").as("clamp50"),
      col("o_totalprice").castTo("int32",
        CastOptions(rounding = Some("half_even")),
        from = DoubleType).as("dollars_i32"))
      .orderBy("o_orderkey")
  }

  // ---- T60: combine_first (cell-wise patch overlay) -------------------------
  /** pandas `a.combine_first(b)` ([[graft.operators.Merge.combineFirst]]):
    * frame `a` (every 3rd order, with holes punched per column on
    * independent key grids) patched by frame `b` (every 2nd order,
    * values MARKED — custkey +10⁶, price ×2, 'B-' prefix — so the
    * provenance of every filled cell is visible in the result), plus a
    * b-only `status` column that must pass through (column-union
    * semantics). Exercises all four cell regimes: a-wins (both
    * non-null), b-fills (a null), a-only key, b-only key. One
    * full-outer equi-join, every column rides the single exchange. */
  def t60CombineFirst(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val a = o.filter(col("o_orderkey") % 3 === 0).select(
      col("o_orderkey").as("k"),
      when(col("o_orderkey") % 5 =!= 0, col("o_custkey")).as("custkey"),
      when(col("o_orderkey") % 7 =!= 0, col("o_totalprice")).as("totalprice"),
      when(col("o_orderkey") % 2 =!= 0, col("o_orderpriority")).as("priority"))
    val b = o.filter(col("o_orderkey") % 2 === 0).select(
      col("o_orderkey").as("k"),
      (col("o_custkey") + 1000000L).as("custkey"),
      (col("o_totalprice") * 2.0).as("totalprice"),
      concat(lit("B-"), col("o_orderpriority")).as("priority"),
      col("o_orderstatus").as("status"))
    graft.operators.Merge.combineFirst(a, b, Seq("k")).orderBy("k")
  }

  // ---- T63: pandas groupby.idxmax / idxmin --------------------------------
  /** pandas `df.groupby('o_custkey')['o_totalprice'].idxmax()` and
    * `['o_orderdate'].idxmin()` — the index LABEL of the extreme row
    * per group, ties resolved to the FIRST occurrence in frame order
    * (pandas semantics; frame order here = `o_orderkey` order, so a
    * tie resolves to the smallest key — pinned, engine-independent).
    * Reference surface: the accessor pairs the type system promises to
    * keep total (`bertrand/types/base/meta.py` comparison protocol —
    * every graft type is totally ordered, so argmin/argmax is always
    * well-defined).
    *
    * Device: ONE groupBy with lexicographic struct min/max — `max` of
    * `(value, -key)` yields max value then (on value ties) max(-key) =
    * MIN key; `min` of `(value, key)` yields min value then min key.
    * Struct min/max is a declarative aggregate: partial (map-side)
    * combine applies, one shuffle on the group key, per-group constant
    * state — no window, no sort of the fact table, no row_number
    * funnel. Scale: the same plan at any SF; date ties are common
    * (orders shares order dates heavily) so the tie-break is exercised
    * on real data, not just in the spec. */
  def t63GroupbyIdxmax(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(
        max(struct(col("o_totalprice").as("v"),
          (-col("o_orderkey")).as("nk"))).as("mx"),
        min(struct(col("o_orderdate").as("v"),
          col("o_orderkey").as("k"))).as("mn"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey").as("custkey"),
        (-col("mx.nk")).as("idxmax_price"),
        col("mx.v").as("max_price"),
        col("mn.k").as("idxmin_date"),
        col("mn.v").as("min_date"),
        col("n_orders"))
      .orderBy("custkey")
  }

  // ---- T64: the pandas .dt accessor datasheet ------------------------------
  /** The pandas `.dt` accessor surface in one pass — year / quarter /
    * month / day / dayofweek / dayofyear / ISO week & ISO year /
    * days_in_month / is_leap_year / is_month_end / is_quarter_end —
    * the reference's PandasTimestamp component getters
    * (`bertrand/types/datetime.pyx` epoch/calendar utilities).
    *
    * Determinism engineering: the two cross-engine hazards are the
    * week-start convention (Spark `dayofweek` 1=Sun, DuckDB `dow`
    * 0=Sun, pandas 0=Mon) and ISO-week edge years (Jan 1 can be week
    * 52/53 of the PREVIOUS iso year). Both are eliminated by deriving
    * everything from the epoch ordinal: dow_mon = (ord+3) mod 7 (pure
    * integer, convention-free — 1970-01-01 was a Thursday), and the
    * ISO pair via the THURSDAY rule (ISO 8601: a date's ISO week/year
    * are those of its week's Thursday, so iso_year = year(thursday),
    * iso_week = (doy(thursday)-1) div 7 + 1) — only `year`, `doy`,
    * and date±days cross engines, all standard. Leap/month-end are
    * integer closed forms ([[TimeFns.isLeapYear]]/`daysInMonth`).
    * Map-only: no shuffle, no join, every getter codegen'd. */
  def t64DtAccessor(s: SparkSession, dir: String): DataFrame =
    dtAccessorColumns(t(s, dir, "orders")
      .select(col("o_orderkey").as("orderkey"),
        col("o_orderdate").cast(DateType).as("d")))

  /** The getter chain on any (orderkey, d: date) frame — factored so
    * the spec can drive pinned edge dates through the SAME columns. */
  private[graft] def dtAccessorColumns(o: DataFrame): DataFrame = {
    import graft.functions.TimeFns
    val ord = TimeFns.dateToOrdinal(col("d"))
    val dowMon = pmod(ord + 3, lit(7)) // 0=Mon..6=Sun, convention-free
    val thursday = TimeFns.ordinalToDate(ord + (lit(3) - dowMon))
    o.select(col("orderkey"), col("d"),
        year(col("d")).cast(IntegerType).as("y"),
        quarter(col("d")).cast(IntegerType).as("q"),
        month(col("d")).cast(IntegerType).as("m"),
        dayofmonth(col("d")).cast(IntegerType).as("dom"),
        dowMon.cast(IntegerType).as("dow_mon"),
        dayofyear(col("d")).cast(IntegerType).as("doy"),
        year(thursday).cast(IntegerType).as("iso_year"),
        (floor((dayofyear(thursday) - 1) / 7) + 1)
          .cast(IntegerType).as("iso_week"),
        dayofmonth(last_day(col("d"))).cast(IntegerType).as("days_in_month"),
        TimeFns.isLeapYear(year(col("d"))).as("is_leap_year"),
        (col("d") === last_day(col("d"))).as("is_month_end"),
        (col("d") === last_day(col("d")) &&
          month(col("d")).isin(3, 6, 9, 12)).as("is_quarter_end"))
      .orderBy("orderkey")
  }

  // ---- T65: pandas Series.autocorr (lagged self-correlation) --------------
  /** pandas `s.autocorr(lag)` per key: Pearson correlation of the
    * per-user DAILY-TOTAL series with itself shifted by 1 and by 7
    * positions — "does yesterday (last week) predict today", the
    * seasonality read run before fitting any forecast. pandas
    * semantics exactly: shift is POSITIONAL over the observed series
    * (`s.corr(s.shift(k))` — calendar gaps do not re-align), pairs
    * with a null lag drop out, and the mean is taken over the ALIGNED
    * pairs (plain Pearson on (x_t, x_{t−k})).
    *
    * Exactness discipline (the t61/t49 lineage): daily totals are
    * exact integer cents, the five Pearson sums accumulate as
    * DECIMAL(38,0) over the aligned pairs (order-free at any
    * partitioning), the kernels NUM = nΣxy−ΣxΣy, DX = nΣx²−(Σx)²,
    * DY = nΣy²−(Σy)² stay exact integers, and r is the pinned IEEE
    * chain NUM_d / (√DX_d · √DY_d) of their decimal→double casts
    * (sqrt and multiply correctly rounded; the DuckDB side routes the
    * casts through VARCHAR — the t61 HUGEINT→DOUBLE finding). Null
    * when n < 2 or either variance is EXACTLY integer zero (the t49
    * ulp lesson — matches pandas NaN on constant series).
    *
    * Scale shape: one (user, day) groupBy, then ONE user-key
    * Exchange+Sort serves both lag columns, then a key-partitioned
    * aggregate — no global window, state per user is the five sums. */
  def t65Autocorr(s: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val daily = events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        (dec(col("value")) * lit(100)).cast(LongType).as("c"))
      .groupBy("user_id", "day").agg(sum(col("c")).as("x"))
    val w = Window.partitionBy("user_id").orderBy("day")
    val lagged = daily
      .withColumn("y1", lag("x", 1).over(w))
      .withColumn("y7", lag("x", 7).over(w))
    def sums(y: Column, p: String) = Seq(
      count(y).as(s"n$p"),
      sum(when(y.isNotNull, col("x")).cast(d38)).as(s"sx$p"),
      sum(y.cast(d38)).as(s"sy$p"),
      sum(col("x").cast(d38) * y.cast(d38)).as(s"sxy$p"),
      sum(when(y.isNotNull, col("x").cast(d38) * col("x").cast(d38)))
        .as(s"sxx$p"),
      sum(y.cast(d38) * y.cast(d38)).as(s"syy$p"))
    val aggs = Seq(count(lit(1)).as("n_days")) ++
      sums(col("y1"), "1") ++ sums(col("y7"), "7")
    val g = lagged.groupBy("user_id").agg(aggs.head, aggs.tail: _*)
    def corr(p: String): Column = graft.operators.SeriesStats.pearson(
      col(s"n$p"), col(s"sx$p"), col(s"sy$p"), col(s"sxy$p"),
      col(s"sxx$p"), col(s"syy$p"))
    g.select(col("user_id"), col("n_days"),
        col("n1").as("n_lag1"), corr("1").as("autocorr_1"),
        col("n7").as("n_lag7"), corr("7").as("autocorr_7"))
      .orderBy("user_id")
  }

  // ---- T66: pandas merge(validate=...) relationship contract ---------------
  /** pandas `merge(..., validate='1:1'|'1:m'|'m:1'|'m:m')` as a
    * REPORT instead of a raise: for two real join pairs
    * (customer→orders on custkey — genuinely 1:m; orders→lineitem on
    * orderkey — genuinely 1:m) every mode's verdict plus the evidence
    * (how many join keys are duplicated on each side). pandas
    * semantics: a mode constrains KEY UNIQUENESS per frame — 1:1
    * needs both sides unique, 1:m the left, m:1 the right, m:m
    * nothing — independent of whether keys actually match across.
    * The contract check a pipeline runs BEFORE a merge whose
    * fan-out would silently duplicate rows.
    *
    * All counts exact integers; per pair ONE groupBy per side on the
    * join key collapsed to a 1-row dup summary (map-side combinable),
    * then the four mode rows explode from a literal array — the x30
    * device: the frames are scanned once per side, the mode grid
    * costs nothing. */
  def t66MergeValidate(s: SparkSession, dir: String): DataFrame = {
    def dupKeys(df: DataFrame, key: String): DataFrame =
      df.groupBy(col(key)).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(when(col("c") > 1, 1L)), lit(0L)).as("dups"))
    def pair(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String): DataFrame =
      dupKeys(left, lk).crossJoin(
          dupKeys(right, rk).withColumnRenamed("dups", "rdups"))
        .select(explode(array(
          struct(lit("1:1").as("mode"),
            (col("dups") === 0 && col("rdups") === 0).as("ok")),
          struct(lit("1:m").as("mode"), (col("dups") === 0).as("ok")),
          struct(lit("m:1").as("mode"), (col("rdups") === 0).as("ok")),
          struct(lit("m:m").as("mode"), lit(true).as("ok")))).as("e"),
          col("dups"), col("rdups"))
        .select(lit(name).as("pair"), col("e.mode").as("mode"),
          col("e.ok").as("is_valid"),
          col("dups").as("n_dup_left_keys"),
          col("rdups").as("n_dup_right_keys"))
    pair("customer_orders",
        t(s, dir, "customer").select("c_custkey"), "c_custkey",
        t(s, dir, "orders").select("o_custkey"), "o_custkey")
      .unionByName(pair("orders_lineitem",
        t(s, dir, "orders").select("o_orderkey"), "o_orderkey",
        t(s, dir, "lineitem").select("l_orderkey"), "l_orderkey"))
      .orderBy("pair", "mode")
  }

  // ---- T67: stack / unstack multi-level reshape round trip -----------------
  /** pandas `stack()`/`unstack()` — the MULTI-LEVEL reshape pair t32's
    * melt (single-level wide→long) and t62's pivot_table (aggregate
    * pivot) don't exercise: a two-level index (priority, status) ×
    * quarter frame is UNSTACKED (quarter level → q1..q4 columns,
    * absent cells null per pandas NaN) and then STACKED back
    * (columns → inner index level, null cells DROPPED — pandas
    * dropna=True default), and the query's output IS the stacked-back
    * long frame — so the hash match against the directly-computed
    * long aggregate proves unstack∘stack = identity including the
    * NaN-drop rule. Absent cells are PLANTED (status P × quarters
    * 2/3 filtered out) so nulls exist to drop at every SF. Plan: ONE
    * groupBy-pivot shuffle with explicit level lists (the t15/t42
    * code contract — no discovery scan); the stack is Spark's native
    * `unpivot` — a generate, zero extra shuffles. Exact integer
    * cents. */
  def t67StackUnstack(s: SparkSession, dir: String): DataFrame = {
    val qs = Seq("q1", "q2", "q3", "q4")
    val base = t(s, dir, "orders")
      .select(col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"),
        concat(lit("q"), quarter(col("o_orderdate"))).as("quarter"),
        (dec(col("o_totalprice")) * 100).cast(LongType).as("c"))
      .filter(!(col("status") === "P" && col("quarter").isin("q2", "q3")))
    val unstacked = base.groupBy("priority", "status")
      .pivot("quarter", qs).agg(sum("c"))
    unstacked
      .unpivot(Array(col("priority"), col("status")),
        qs.map(col).toArray, "quarter", "sum_cents")
      .filter(col("sum_cents").isNotNull) // pandas stack dropna=True
      .orderBy("priority", "status", "quarter")
  }

  // ---- T68: rolling quantile (linear interpolation) -------------------------
  /** pandas `rolling(4, min_periods=4).quantile(q)` for q ∈ {0.25,
    * 0.5, 0.75}, interpolation='linear' — extending t52's
    * selection-network device from the 3-median to full 4-element
    * ORDER STATISTICS: the 5-comparator min/max network (no sort, no
    * arithmetic) yields x0≤x1≤x2≤x3 bit-for-bit equal to the inputs,
    * then each quantile is pandas' idx = q·(n−1) linear blend —
    * x_⌊idx⌋ + frac·(x_⌊idx⌋₊₁ − x_⌊idx⌋) — ONE pinned IEEE
    * multiply-add per output (q25: x0+0.75·(x1−x0); q50:
    * x1+0.5·(x2−x1); q75: x2+0.25·(x3−x2)). The t45 lag-pinned
    * discipline: explicit lags fix the frame, warm-up rows are null
    * exactly like pandas NaN, and ONE partition-key Exchange+Sort
    * serves all three lags and every quantile. The mergeable q60
    * histogram sketch is the documented 100 TB swap for long windows;
    * this is the exact short-window form. Kernel shared with
    * streaming S37 via [[graft.operators.SeriesStats.rollingQuantiles]]
    * so the live fold equals this batch pass by construction. */
  def t68RollingQuantile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("es", "event_id")
    val (q25, q50, q75) = graft.operators.SeriesStats.rollingQuantiles(
      col("value"), col("l1"), col("l2"), col("l3"))
    events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("value"))
      .withColumn("l1", lag("value", 1).over(w))
      .withColumn("l2", lag("value", 2).over(w))
      .withColumn("l3", lag("value", 3).over(w))
      .select(col("user_id"), col("es"), col("event_id"), col("value"),
        q25.as("roll_q25"), q50.as("roll_q50"), q75.as("roll_q75"))
      .orderBy("user_id", "es", "event_id")
  }

  // ---- T69: merge_ordered with group-wise forward fill -----------------------
  /** pandas `merge_ordered(left, right, on='ts', left_by='user_id',
    * fill_method='ffill')` — the ORDERED two-frame merge verb (align
    * two per-key time series onto the union of their timestamps,
    * forward-filling each frame's columns over the other's rows) that
    * q46's grid resample and t30's interpolate don't express: here
    * the grid is the OTHER SERIES' event times, not a calendar. Left
    * = view events, right = purchase events per user; output = every
    * event instant of either series with both series' last-known
    * values. Tie rule pinned: same-instant rows order left-before-
    * right then by event id (pandas keeps left frame first on key
    * ties). Plan: tagged unionByName (no join — the merge IS a union
    * + fill) and BOTH ffill windows ride ONE user-key Exchange+Sort;
    * unmatched leading rows stay null exactly like pandas NaN. */
  def t69MergeOrdered(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("event_id"), col("event_type"), col("value"))
    val left = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("es"), col("event_id"),
        lit(0).as("src"), col("value").as("v_view"),
        lit(null).cast(DoubleType).as("v_buy"))
    val right = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("es"), col("event_id"),
        lit(1).as("src"), lit(null).cast(DoubleType).as("v_view"),
        col("value").as("v_buy"))
    val w = Window.partitionBy("user_id").orderBy("es", "src", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .select(col("user_id"), col("es"), col("event_id"), col("src"),
        last(col("v_view"), ignoreNulls = true).over(w).as("v_view"),
        last(col("v_buy"), ignoreNulls = true).over(w).as("v_buy"))
      .orderBy("user_id", "es", "src", "event_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t69_merge_ordered" -> t69MergeOrdered _,
    "t67_stack_unstack" -> t67StackUnstack _,
    "t68_rolling_quantile" -> t68RollingQuantile _,
    "t66_merge_validate" -> t66MergeValidate _,
    "t65_autocorr" -> t65Autocorr _,
    "t64_dt_accessor" -> t64DtAccessor _,
    "t63_groupby_idxmax" -> t63GroupbyIdxmax _,
    "t60_combine_first" -> t60CombineFirst _,
    "t59_custom_cast" -> t59CustomCast _,
    "t56_kleene_bool" -> t56KleeneBool _,
    "t58_business_days" -> t58BusinessDays _,
    "t57_query_predicates" -> t57QueryPredicates _,
    "t70_eval_program" -> t70EvalProgram _,
    "t55_frame_compare" -> t55FrameCompare _,
    "t54_json_normalize" -> t54JsonNormalize _,
    "t53_resample_ohlc" -> t53ResampleOhlc _,
    "t52_rolling_median" -> t52RollingMedian _,
    "t51_factorize" -> t51Factorize _,
    "t50_mad_outliers" -> t50MadOutliers _,
    "t49_rolling_corr" -> t49RollingCorr _,
    "t48_expanding" -> t48Expanding _,
    "t61_expanding_skew_kurt" -> t61ExpandingSkewKurt _,
    "t62_pivot_table" -> t62PivotTable _,
    "t47_union_typecheck" -> t47UnionTypecheck _,
    "t46_sparse_categorical" -> t46SparseCategorical _,
    "t44_ewm" -> t44Ewm _,
    "t45_rolling_std" -> t45RollingStd _,
    "t41_merge_indicator" -> t41MergeIndicator _,
    "t42_get_dummies" -> t42GetDummies _,
    "t43_clip_where" -> t43ClipWhere _,
    "t40_timezone" -> t40Timezone _,
    "t39_crosstab" -> t39Crosstab _,
    "t37_group_transform" -> t37GroupTransform _,
    "t38_drop_duplicates" -> t38DropDuplicates _,
    "t36_array_ops" -> t36ArrayOps _,
    "t35_str_accessor" -> t35StrAccessor _,
    "t32_melt" -> t32Melt _,
    "t33_rank_methods" -> t33RankMethods _,
    "t34_shift_diff" -> t34ShiftDiff _,
    "t31_cut_qcut" -> t31CutQcut _,
    "t30_interpolate" -> t30Interpolate _,
    "t29_cast_ignore" -> t29CastIgnore _,
    "t28_ingest_infer" -> t28IngestInfer _,
    "t27_profile" -> t27Profile _,
    "t26_sparse_compute" -> t26SparseCompute _,
    "t25_object_roundtrip" -> t25ObjectRoundtrip _,
    "t23_parse_datetime" -> t23ParseDatetime _,
    "t24_to_string" -> t24ToString _,
    "t21_unit_calendar" -> t21UnitCalendar _,
    "t22_parse_strings" -> t22ParseStrings _,
    "t20_round_decimal" -> t20RoundDecimal _,
    "t1_detect_types" -> t1Detect _,
    "t2_resolve_spec" -> t2Resolve _,
    "t3_typecheck" -> t3Typecheck _,
    "t4_cast_int" -> t4CastInt _,
    "t5_cast_bool" -> t5CastBool _,
    "t6_cast_string_num" -> t6CastStringNum _,
    "t7_cast_datetime" -> t7CastDatetime _,
    "t8_cast_timedelta" -> t8CastTimedelta _,
    "t9_cast_decimal" -> t9CastDecimal _,
    "t10_round_rules" -> t10RoundRules _,
    "t11_round_div" -> t11RoundDiv _,
    "t12_tolerance_snap" -> t12Snap _,
    "t13_downcast" -> t13Downcast _,
    "t14_missing" -> t14Missing _,
    "t15_categorical" -> t15Categorical _,
    "t16_sparse" -> t16Sparse _,
    "t17_time_units" -> t17TimeUnits _,
    "t18_cast_complex" -> t18Complex _,
    "t19_mixed_sac" -> t19MixedSac _,
  )

  // ---------- oracle SQL ----------------------------------------------------

  /** DuckDB formula mirroring Rounding.roundFloat(x, rule, d). */
  private def roundSql(x: String, rule: String, d: Int): String = {
    val s = math.pow(10, d)
    val y = s"($x * $s)"
    val f = s"FLOOR($y)"
    val scaled = rule match {
      case "floor" => f
      case "ceiling" => s"CEIL($y)"
      case "down" => s"SIGN($y) * FLOOR(ABS($y))"
      case "up" => s"SIGN($y) * CEIL(ABS($y))"
      case "half_floor" => s"CEIL($y - 0.5)"
      case "half_ceiling" => s"FLOOR($y + 0.5)"
      case "half_down" => s"SIGN($y) * CEIL(ABS($y) - 0.5)"
      case "half_up" => s"SIGN($y) * FLOOR(ABS($y) + 0.5)"
      case "half_even" =>
        s"""CASE WHEN $y - $f > 0.5 THEN $f + 1
           | WHEN $y - $f < 0.5 THEN $f
           | WHEN $f - 2*FLOOR($f/2) = 0 THEN $f ELSE $f + 1 END""".stripMargin
    }
    s"(($scaled) / $s)"
  }

  /** DuckDB formula body mirroring Rounding.roundDiv(a, b, rule)
    * (expects qf/qc/mag/a/b in scope). */
  private def divBodySql(rule: String): String = {
    val neg = "(SIGN(a)*SIGN(b) < 0)"
    rule match {
      case "floor" => "qf"
      case "ceiling" => "qc"
      case "down" => s"CASE WHEN $neg THEN qc ELSE qf END"
      case "up" => s"CASE WHEN $neg THEN qf ELSE qc END"
      case "half_floor" => "CASE WHEN mag*2 > ABS(b) THEN qc ELSE qf END"
      case "half_ceiling" => "CASE WHEN mag*2 >= ABS(b) THEN qc ELSE qf END"
      case "half_down" => s"CASE WHEN mag*2 > ABS(b) OR (mag*2 = ABS(b) AND $neg) THEN qc ELSE qf END"
      case "half_up" => s"CASE WHEN mag*2 > ABS(b) OR (mag*2 = ABS(b) AND NOT $neg) THEN qc ELSE qf END"
      case "half_even" =>
        """CASE WHEN mag*2 > ABS(b) THEN qc WHEN mag*2 < ABS(b) THEN qf
          | WHEN ((qf % 2) + 2) % 2 = 0 THEN qf ELSE qc END""".stripMargin
    }
  }

  private def divSql(rule: String): String =
    s"CAST(${divBodySql(rule)} AS BIGINT) AS q_$rule"

  private val floatReSql = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  // ---- t22 oracle generators: built from the SAME regex constants the
  // Spark kernels use (TimeFns.clockRe/secRe/abbrevRe, Casts.complex*Re)
  // so engine and oracle can only diverge on evaluation, not pattern.
  private def sqlList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")
  private def tdPart(re: String, g: Int): String =
    s"COALESCE(TRY_CAST(NULLIF(regexp_extract(td_n, '$re', $g), '') AS DOUBLE), 0)"
  private def tdUs(re: String, g: Int, unit: Double): String =
    s"CAST(FLOOR(${tdPart(re, g)} * $unit + 0.5) AS BIGINT)"
  private def tdSign(re: String): String =
    s"(CASE WHEN regexp_extract(td_n, '$re', 1) = '-' THEN -1 ELSE 1 END)"
  private def t22OracleSql: String = {
    import TimeFns.{clockRe, secRe, abbrevRe, wUs, dUs, hUs, mUs, sUs}
    val norm = TimeFns.tdReplacements.foldLeft(
      "regexp_replace(lower(trim(td_s)), '\\s+', '', 'g')") {
      case (acc, (p, r)) => s"regexp_replace($acc, '$p', '$r', 'g')"
    }
    val clockVal = s"${tdSign(clockRe)} * (${tdUs(clockRe, 2, wUs)} + ${tdUs(clockRe, 3, dUs)} + " +
      s"CASE WHEN regexp_extract(td_n, '$clockRe', 6) != '' " +
      s"THEN ${tdUs(clockRe, 4, hUs)} + ${tdUs(clockRe, 5, mUs)} + ${tdUs(clockRe, 6, sUs)} " +
      s"ELSE ${tdUs(clockRe, 4, mUs)} + ${tdUs(clockRe, 5, sUs)} END)"
    val secVal = s"${tdSign(secRe)} * ${tdUs(secRe, 2, sUs)}"
    val abbrevVal = s"${tdSign(abbrevRe)} * (${tdUs(abbrevRe, 2, wUs)} + ${tdUs(abbrevRe, 3, dUs)} + " +
      s"${tdUs(abbrevRe, 4, hUs)} + ${tdUs(abbrevRe, 5, mUs)} + ${tdUs(abbrevRe, 6, sUs)} + " +
      s"${tdUs(abbrevRe, 7, 1000.0)} + ${tdUs(abbrevRe, 8, 1.0)})"
    val bothRe = Casts.complexBothRe
    val imRe = Casts.complexImRe
    val reRe = Casts.complexReRe
    val imCoeff = s"regexp_extract(z_t, '$imRe', 1)"
    s"""WITH f AS (
       |  SELECT o_orderkey,
       |    (${sqlList(tdForms)})[CAST(o_orderkey % ${tdForms.size} AS INT) + 1] AS td_s,
       |    (${sqlList(zForms)})[CAST(o_orderkey % ${zForms.size} AS INT) + 1] AS z_s
       |  FROM orders WHERE o_orderkey <= 500),
       |n AS (SELECT *, $norm AS td_n, trim(z_s) AS z_t FROM f)
       |SELECT o_orderkey, td_s, z_s,
       |  CASE WHEN regexp_matches(td_n, '$clockRe') THEN $clockVal
       |       WHEN regexp_matches(td_n, '$secRe') THEN $secVal
       |       WHEN regexp_matches(td_n, '$abbrevRe') AND regexp_matches(td_n, '\\d') THEN $abbrevVal
       |       ELSE NULL END AS td_us,
       |  CASE WHEN regexp_matches(z_t, '$bothRe') THEN TRY_CAST(regexp_extract(z_t, '$bothRe', 1) AS DOUBLE)
       |       WHEN regexp_matches(z_t, '$imRe') THEN 0.0
       |       WHEN regexp_matches(z_t, '$reRe') THEN TRY_CAST(regexp_extract(z_t, '$reRe', 1) AS DOUBLE)
       |       ELSE NULL END AS z_re,
       |  CASE WHEN regexp_matches(z_t, '$bothRe') THEN TRY_CAST(regexp_extract(z_t, '$bothRe', 2) AS DOUBLE)
       |       WHEN regexp_matches(z_t, '$imRe') THEN
       |         (CASE WHEN $imCoeff IN ('', '+') THEN 1.0
       |               WHEN $imCoeff = '-' THEN -1.0
       |               ELSE TRY_CAST($imCoeff AS DOUBLE) END)
       |       WHEN regexp_matches(z_t, '$reRe') THEN 0.0
       |       ELSE NULL END AS z_im
       |FROM n ORDER BY o_orderkey""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // t69: identical tagged union + IGNORE NULLS fill windows,
    // identical (es, src, event_id) tie pinning
    "t69_merge_ordered" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    event_id, event_type, value FROM events),
        |u AS (
        |  SELECT user_id, es, event_id, 0 AS src,
        |    value AS v_view, CAST(NULL AS DOUBLE) AS v_buy
        |  FROM e WHERE event_type = 'view'
        |  UNION ALL
        |  SELECT user_id, es, event_id, 1 AS src,
        |    CAST(NULL AS DOUBLE) AS v_view, value AS v_buy
        |  FROM e WHERE event_type = 'purchase')
        |SELECT user_id, es, event_id, CAST(src AS INT) AS src,
        |  last_value(v_view IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY es, src, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_view,
        |  last_value(v_buy IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY es, src, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_buy
        |FROM u ORDER BY user_id, es, src, event_id""".stripMargin,
    // t67: the directly-computed long aggregate — semantic truth for
    // the pivot→unpivot round trip (a broken unstack/stack could not
    // reproduce it); same planted absences, exact integer cents
    "t67_stack_unstack" ->
      """SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |  'q' || CAST(quarter(o_orderdate) AS VARCHAR) AS quarter,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        |    AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders
        |WHERE NOT (o_orderstatus = 'P'
        |  AND quarter(o_orderdate) IN (2, 3))
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // t68: identical lag frame, identical least/greatest selection
    // network, identical pinned multiply-add blends
    "t68_rolling_quantile" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    event_id, value FROM events),
        |l AS (SELECT user_id, es, event_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS l1,
        |    lag(value, 2) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS l2,
        |    lag(value, 3) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS l3
        |  FROM e),
        |n AS (SELECT user_id, es, event_id, value,
        |    LEAST(value, l1) AS a, GREATEST(value, l1) AS b,
        |    LEAST(l2, l3) AS c, GREATEST(l2, l3) AS d,
        |    l1 IS NULL OR l2 IS NULL OR l3 IS NULL AS warm
        |  FROM l),
        |x AS (SELECT user_id, es, event_id, value, warm,
        |    LEAST(a, c) AS x0, LEAST(GREATEST(a, c), LEAST(b, d)) AS x1,
        |    GREATEST(GREATEST(a, c), LEAST(b, d)) AS x2,
        |    GREATEST(b, d) AS x3
        |  FROM n)
        |SELECT user_id, es, event_id, value,
        |  CASE WHEN warm THEN NULL ELSE x0 + 0.75 * (x1 - x0) END
        |    AS roll_q25,
        |  CASE WHEN warm THEN NULL ELSE x1 + 0.5 * (x2 - x1) END
        |    AS roll_q50,
        |  CASE WHEN warm THEN NULL ELSE x2 + 0.25 * (x3 - x2) END
        |    AS roll_q75
        |FROM x ORDER BY user_id, es, event_id""".stripMargin,
    // t66: dup-key summaries per side + the same literal mode grid
    "t66_merge_validate" ->
      """WITH co_l AS (SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 END), 0)
        |    AS BIGINT) AS dups
        |  FROM (SELECT c_custkey, COUNT(*) AS c FROM customer GROUP BY 1)),
        |co_r AS (SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 END), 0)
        |    AS BIGINT) AS dups
        |  FROM (SELECT o_custkey, COUNT(*) AS c FROM orders GROUP BY 1)),
        |ol_l AS (SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 END), 0)
        |    AS BIGINT) AS dups
        |  FROM (SELECT o_orderkey, COUNT(*) AS c FROM orders GROUP BY 1)),
        |ol_r AS (SELECT CAST(COALESCE(SUM(CASE WHEN c > 1 THEN 1 END), 0)
        |    AS BIGINT) AS dups
        |  FROM (SELECT l_orderkey, COUNT(*) AS c FROM lineitem GROUP BY 1)),
        |pairs AS (
        |  SELECT 'customer_orders' AS pair, co_l.dups AS ld, co_r.dups AS rd
        |  FROM co_l, co_r
        |  UNION ALL
        |  SELECT 'orders_lineitem', ol_l.dups, ol_r.dups FROM ol_l, ol_r),
        |modes(mode) AS (VALUES ('1:1'), ('1:m'), ('m:1'), ('m:m'))
        |SELECT pair, mode,
        |  CASE mode WHEN '1:1' THEN ld = 0 AND rd = 0
        |            WHEN '1:m' THEN ld = 0
        |            WHEN 'm:1' THEN rd = 0
        |            ELSE TRUE END AS is_valid,
        |  ld AS n_dup_left_keys, rd AS n_dup_right_keys
        |FROM pairs CROSS JOIN modes
        |ORDER BY pair, mode""".stripMargin,
    // t65: identical HUGEINT Pearson kernels over the lagged daily
    // series; decimal→double through VARCHAR (the t61 device), same
    // exact-zero variance guards
    "t65_autocorr" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        |      AS HUGEINT) AS x
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT user_id, x,
        |    LAG(x, 1) OVER win AS y1,
        |    LAG(x, 7) OVER win AS y7
        |  FROM daily WINDOW win AS (PARTITION BY user_id ORDER BY day)),
        |g AS (SELECT user_id, COUNT(*) AS n_days,
        |    COUNT(y1) AS n1, SUM(CASE WHEN y1 IS NOT NULL THEN x END) AS sx1,
        |    SUM(y1) AS sy1, SUM(x * y1) AS sxy1,
        |    SUM(CASE WHEN y1 IS NOT NULL THEN x * x END) AS sxx1,
        |    SUM(y1 * y1) AS syy1,
        |    COUNT(y7) AS n7, SUM(CASE WHEN y7 IS NOT NULL THEN x END) AS sx7,
        |    SUM(y7) AS sy7, SUM(x * y7) AS sxy7,
        |    SUM(CASE WHEN y7 IS NOT NULL THEN x * x END) AS sxx7,
        |    SUM(y7 * y7) AS syy7
        |  FROM l GROUP BY 1),
        |k AS (SELECT user_id, n_days, n1, n7,
        |    CAST(n1 AS HUGEINT) * sxy1 - sx1 * sy1 AS num1,
        |    CAST(n1 AS HUGEINT) * sxx1 - sx1 * sx1 AS dx1,
        |    CAST(n1 AS HUGEINT) * syy1 - sy1 * sy1 AS dy1,
        |    CAST(n7 AS HUGEINT) * sxy7 - sx7 * sy7 AS num7,
        |    CAST(n7 AS HUGEINT) * sxx7 - sx7 * sx7 AS dx7,
        |    CAST(n7 AS HUGEINT) * syy7 - sy7 * sy7 AS dy7
        |  FROM g)
        |SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(n1 AS BIGINT) AS n_lag1,
        |  CASE WHEN n1 >= 2 AND dx1 > 0 AND dy1 > 0 THEN
        |    CAST(CAST(num1 AS VARCHAR) AS DOUBLE) /
        |      (sqrt(CAST(CAST(dx1 AS VARCHAR) AS DOUBLE))
        |        * sqrt(CAST(CAST(dy1 AS VARCHAR) AS DOUBLE)))
        |  END AS autocorr_1,
        |  CAST(n7 AS BIGINT) AS n_lag7,
        |  CASE WHEN n7 >= 2 AND dx7 > 0 AND dy7 > 0 THEN
        |    CAST(CAST(num7 AS VARCHAR) AS DOUBLE) /
        |      (sqrt(CAST(CAST(dx7 AS VARCHAR) AS DOUBLE))
        |        * sqrt(CAST(CAST(dy7 AS VARCHAR) AS DOUBLE)))
        |  END AS autocorr_7
        |FROM k ORDER BY user_id""".stripMargin,
    // t64: identical ordinal arithmetic — DuckDB date-date is integer
    // days, so dow_mon/thursday replay the exact pmod/(+3-wd) chain;
    // only year()/dayofyear()/last_day()/date+days cross engines
    "t64_dt_accessor" ->
      """WITH b AS (SELECT o_orderkey AS orderkey,
        |    CAST(o_orderdate AS DATE) AS d,
        |    ((CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
        |      + 3) % 7 + 7) % 7 AS dow_mon
        |  FROM orders),
        |c AS (SELECT *, d + CAST(3 - dow_mon AS INTEGER) AS thursday FROM b)
        |SELECT orderkey, d,
        |  CAST(year(d) AS INTEGER) AS y,
        |  CAST(quarter(d) AS INTEGER) AS q,
        |  CAST(month(d) AS INTEGER) AS m,
        |  CAST(day(d) AS INTEGER) AS dom,
        |  CAST(dow_mon AS INTEGER) AS dow_mon,
        |  CAST(dayofyear(d) AS INTEGER) AS doy,
        |  CAST(year(thursday) AS INTEGER) AS iso_year,
        |  CAST((dayofyear(thursday) - 1) // 7 + 1 AS INTEGER) AS iso_week,
        |  CAST(day(last_day(d)) AS INTEGER) AS days_in_month,
        |  (year(d) % 4 = 0 AND year(d) % 100 <> 0) OR year(d) % 400 = 0
        |    AS is_leap_year,
        |  d = last_day(d) AS is_month_end,
        |  d = last_day(d) AND month(d) IN (3, 6, 9, 12) AS is_quarter_end
        |FROM c ORDER BY orderkey""".stripMargin,
    // t63: the SAME lexicographic struct min/max device replayed in
    // DuckDB (struct_pack compares field-by-field exactly like Spark's
    // named_struct ordering) — deterministic by total-order
    // construction on BOTH engines, no reliance on either engine's
    // arg_min/first tie behavior; values pass through untouched
    "t63_groupby_idxmax" ->
      """WITH g AS (SELECT o_custkey,
        |    MAX(struct_pack(v := o_totalprice, nk := -o_orderkey)) AS mx,
        |    MIN(struct_pack(v := o_orderdate, k := o_orderkey)) AS mn,
        |    COUNT(*) AS n
        |  FROM orders GROUP BY 1)
        |SELECT o_custkey AS custkey,
        |  CAST(-(mx.nk) AS BIGINT) AS idxmax_price,
        |  mx.v AS max_price,
        |  CAST(mn.k AS BIGINT) AS idxmin_date,
        |  mn.v AS min_date,
        |  CAST(n AS BIGINT) AS n_orders
        |FROM g ORDER BY custkey""".stripMargin,
    // t60: the same two frames + full-outer + per-column COALESCE;
    // ×2.0 of a double and +10⁶ of a bigint are exact, values only
    // pass through — no float arithmetic crosses the compare boundary
    "t60_combine_first" ->
      """WITH a AS (SELECT o_orderkey AS k,
        |    CASE WHEN o_orderkey % 5 <> 0 THEN o_custkey END AS custkey,
        |    CASE WHEN o_orderkey % 7 <> 0 THEN o_totalprice END AS totalprice,
        |    CASE WHEN o_orderkey % 2 <> 0 THEN o_orderpriority END AS priority
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |b AS (SELECT o_orderkey AS k,
        |    CAST(o_custkey + 1000000 AS BIGINT) AS custkey,
        |    o_totalprice * 2.0 AS totalprice,
        |    'B-' || o_orderpriority AS priority,
        |    o_orderstatus AS status
        |  FROM orders WHERE o_orderkey % 2 = 0)
        |SELECT COALESCE(a.k, b.k) AS k,
        |  COALESCE(a.custkey, b.custkey) AS custkey,
        |  COALESCE(a.totalprice, b.totalprice) AS totalprice,
        |  COALESCE(a.priority, b.priority) AS priority,
        |  b.status AS status
        |FROM a FULL OUTER JOIN b ON a.k = b.k
        |ORDER BY k""".stripMargin,
    // t59: the registered kernels replayed as plain SQL — the exact
    // OVERRIDING cents kernel (proving the override, not the original
    // coarse registration, is what castTo consulted), the clamp
    // callable, and t4's proven half_even device for the builtin leg
    "t59_custom_cast" ->
      s"""SELECT o_orderkey,
         |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
         |    AS cents,
         |  CAST(LEAST(o_orderkey % 80, 50) AS BIGINT) AS clamp50,
         |  CAST(${roundSql("o_totalprice", "half_even", 0)} AS INTEGER)
         |    AS dollars_i32
         |FROM orders ORDER BY o_orderkey""".stripMargin,
    // t58: the same closed forms in DuckDB integer arithmetic — the
    // weekday index from the epoch ordinal on both engines, never from
    // each engine's own week-start convention
    "t58_business_days" ->
      """WITH b AS (SELECT o_orderkey, o_orderdate,
        |    date_diff('day', DATE '1970-01-01', o_orderdate) AS u
        |  FROM orders),
        |c AS (SELECT *, (u + 3) % 7 AS wd FROM b),
        |d AS (SELECT o_orderkey, o_orderdate, u, wd,
        |    u - CASE WHEN wd = 5 THEN 1 WHEN wd = 6 THEN 2 ELSE 0 END AS eu,
        |    CASE WHEN wd > 4 THEN 4 ELSE wd END AS ew FROM c)
        |SELECT o_orderkey, o_orderdate, wd,
        |  DATE '1970-01-01' + CAST(eu + 1 + 2 * ((ew + 1) // 5) AS INT)
        |    AS bday1,
        |  DATE '1970-01-01' + CAST(eu + 5 + 2 * ((ew + 5) // 5) AS INT)
        |    AS bday5,
        |  DATE '1970-01-01' + CAST(eu + 20 + 2 * ((ew + 20) // 5) AS INT)
        |    AS bday20,
        |  (5 * ((u + 30) // 7) + ([0,1,2,2,2,3,4])[(u + 30) % 7 + 1])
        |    - (5 * (u // 7) + ([0,1,2,2,2,3,4])[u % 7 + 1]) AS bdays_30d
        |FROM d ORDER BY o_orderkey""".stripMargin,
    // t56: the same Kleene grid in DuckDB's three-valued engine —
    // the hash match is the cross-engine parity certificate
    "t56_kleene_bool" ->
      """WITH g0 AS (SELECT l_returnflag AS flag,
        |    CASE WHEN l_linenumber % 3 = 0 THEN NULL
        |      ELSE l_quantity > 30 END AS a,
        |    CASE WHEN l_partkey % 5 = 0 THEN NULL
        |      ELSE l_discount > CAST(0.05 AS DOUBLE) END AS b
        |  FROM lineitem),
        |g AS (SELECT flag, a, b, a AND b AS andv, a OR b AS orv,
        |    a <> b AS xorv FROM g0)
        |SELECT flag, COUNT(*) AS n,
        |  COUNT(CASE WHEN a IS NULL THEN 1 END) AS a_null,
        |  COUNT(CASE WHEN b IS NULL THEN 1 END) AS b_null,
        |  COUNT(CASE WHEN andv THEN 1 END) AS and_t,
        |  COUNT(CASE WHEN NOT andv THEN 1 END) AS and_f,
        |  COUNT(CASE WHEN andv IS NULL THEN 1 END) AS and_n,
        |  COUNT(CASE WHEN orv THEN 1 END) AS or_t,
        |  COUNT(CASE WHEN NOT orv THEN 1 END) AS or_f,
        |  COUNT(CASE WHEN orv IS NULL THEN 1 END) AS or_n,
        |  COUNT(CASE WHEN xorv THEN 1 END) AS xor_t,
        |  COUNT(CASE WHEN NOT xorv THEN 1 END) AS xor_f,
        |  COUNT(CASE WHEN xorv IS NULL THEN 1 END) AS xor_n,
        |  COALESCE(BOOL_OR(a), false) AS any_skipna,
        |  COALESCE(BOOL_AND(a), true) AS all_skipna,
        |  CASE WHEN COALESCE(BOOL_OR(a), false) THEN 'true'
        |    WHEN COUNT(CASE WHEN a IS NULL THEN 1 END) > 0 THEN 'NA'
        |    ELSE 'false' END AS any_strict,
        |  CASE WHEN NOT COALESCE(BOOL_AND(a), true) THEN 'false'
        |    WHEN COUNT(CASE WHEN a IS NULL THEN 1 END) > 0 THEN 'NA'
        |    ELSE 'true' END AS all_strict
        |FROM g GROUP BY flag ORDER BY flag""".stripMargin,
    // t57: hand-translated WHEREs — independent semantics for the
    // parser's pinned reading; float literals CAST AS DOUBLE
    "t57_query_predicates" -> {
      val wheres = Seq(
        "l_quantity > 45" -> "l_quantity > 45",
        "l_returnflag == 'R' and l_quantity <= 10" ->
          "l_returnflag = 'R' AND l_quantity <= 10",
        "not (l_linestatus == 'O') or l_discount >= 0.08" ->
          "NOT (l_linestatus = 'O') OR l_discount >= CAST(0.08 AS DOUBLE)",
        "l_returnflag in ('A', 'N') and l_tax < 0.03" ->
          "l_returnflag IN ('A', 'N') AND l_tax < CAST(0.03 AS DOUBLE)",
        "l_extendedprice / l_quantity > 1500 and l_quantity * 2 < 20" ->
          "l_extendedprice / l_quantity > 1500 AND l_quantity * 2 < 20",
        "l_tax - l_discount > 0.05 or l_quantity + 5 >= 55" ->
          "l_tax - l_discount > CAST(0.05 AS DOUBLE) OR l_quantity + 5 >= 55",
        // @refs: the oracle inlines the env constants the parser
        // resolved (minqty=45, flag='R', flags=('A','N'))
        "l_quantity >= @minqty and l_returnflag == @flag" ->
          "l_quantity >= 45 AND l_returnflag = 'R'",
        "l_returnflag in @flags and l_quantity < 8" ->
          "l_returnflag IN ('A', 'N') AND l_quantity < 8",
        "l_discount + l_tax > l_quantity / 400" ->
          "l_discount + l_tax > l_quantity / 400",
        "5 <= l_quantity < 10" ->
          "5 <= l_quantity AND l_quantity < 10",
        "l_returnflag not in ('A', 'N') & ~(l_linestatus == 'F')" ->
          "l_returnflag NOT IN ('A', 'N') AND NOT (l_linestatus = 'F')",
        // Python modulo = ((a fmod b) + b) fmod b; '**' = double POWER
        // with the power tower hand-parenthesized to the Python
        // reading (right-assoc, tighter than unary minus)
        "(l_quantity - 30) % 7 == 3" ->
          "fmod(fmod(l_quantity - 30, 7) + 7, 7) = 3",
        // Python floor division on a signed dividend: floor(a / b)
        "(l_quantity - 30) // 7 == -2" ->
          "CAST(FLOOR((l_quantity - 30) / 7) AS BIGINT) = -2",
        "l_discount ** 2 > 0.006 and l_quantity < 25" ->
          "POWER(l_discount, 2) > CAST(0.006 AS DOUBLE) AND l_quantity < 25",
        "2 ** 3 ** 2 == 512 and -2 ** 2 == -4 and l_returnflag == 'R'" ->
          ("POWER(2, POWER(3, 2)) = 512 AND -POWER(2, 2) = -4 " +
            "AND l_returnflag = 'R'"),
        // negative-divisor %: the same fmod composition, b = -7 —
        // DuckDB's fmod is C remainder, so ((a fmod b) + b) fmod b
        // follows Python's divisor-sign result for b < 0 too
        "(l_quantity - 30) % -7 == -4" ->
          "fmod(fmod(l_quantity - 30, -7) + -7, -7) = -4",
        // scientific-notation literals parse as DOUBLE on both engines
        "l_discount > 5e-2" ->
          "l_discount > CAST(5e-2 AS DOUBLE)",
        "l_extendedprice >= 1.5E3 and l_quantity < 3" ->
          "l_extendedprice >= CAST(1.5E3 AS DOUBLE) AND l_quantity < 3",
        // INTEGRAL // and % replayed in exact BIGINT arithmetic.
        // DuckDB's // TRUNCATES (7 // -3 = -2) where Python floors,
        // so the sign-mismatch rows carry the floor correction term;
        // same-sign rows need none (truncate = floor there). 2^53+1
        // operands make a double-domain replay disagree — exactness
        // is the point of these rows.
        "(9007199254740993 + l_linenumber) // 3 >= 3002399751580332" ->
          "(9007199254740993 + l_linenumber) // 3 >= 3002399751580332",
        "(-9007199254740993 - l_linenumber) // 3 == -3002399751580332" ->
          ("((-9007199254740993 - l_linenumber) // 3 - " +
            "(CASE WHEN (-9007199254740993 - l_linenumber) % 3 <> 0 " +
            "THEN 1 ELSE 0 END)) = -3002399751580332"),
        "(l_linenumber - 10) // -3 == 2" ->
          "(l_linenumber - 10) // -3 = 2",
        "l_orderkey % 7 == 3 and l_quantity < 30" ->
          "l_orderkey % 7 = 3 AND l_quantity < 30",
        "(l_linenumber - 10) % -3 == -2" ->
          "(l_linenumber - 10) % -3 = -2")
      val rows = wheres.map { case (p, w) =>
        val lbl = p.replace("'", "''")
        s"""SELECT '$lbl' AS predicate,
           |  CAST(SUM(CASE WHEN $w THEN 1 ELSE 0 END) AS BIGINT) AS n_rows,
           |  COALESCE(CAST(SUM(CASE WHEN $w
           |    THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE), 0.0)
           |    AS qty_total
           |FROM lineitem""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""SELECT * FROM (
         |$rows
         |) ORDER BY predicate""".stripMargin
    },
    // t70: independent replay of the eval program — CTEs for the
    // statement sequencing, fmod composition for Python's %, POWER
    // for ** (exact on the 2^0..2^6 grid); thresholds compare the
    // SAME per-row IEEE doubles, sums are counts or exact decimals
    "t70_eval_program" ->
      """WITH e AS (
        |  SELECT l_quantity,
        |    fmod(fmod(l_quantity, 7) + 7, 7) AS bucket,
        |    POWER(2, fmod(fmod(l_quantity, 7) + 7, 7)) AS boost,
        |    l_extendedprice * (1 - l_discount) AS margin
        |  FROM lineitem),
        |e2 AS (SELECT *, margin * boost AS score FROM e)
        |SELECT CAST(bucket AS BIGINT) AS bucket,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN score > 200000 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_hi,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
        |FROM e2 GROUP BY 1 ORDER BY 1""".stripMargin,
    // t55: identical cents-string cells, identical plants, identical
    // null-safe inequality
    "t55_frame_compare" ->
      """WITH o AS (SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS cents,
        |    o_orderpriority AS pri, o_orderstatus AS st FROM orders),
        |old AS (SELECT k, CAST(cents AS VARCHAR) AS price,
        |    pri AS priority, st AS status FROM o),
        |nw AS (SELECT k,
        |    CAST(cents + CASE WHEN k % 11 = 1 THEN 100 ELSE 0 END
        |      AS VARCHAR) AS price,
        |    CASE WHEN k % 13 = 2 THEN pri || '-X' ELSE pri END AS priority,
        |    st AS status FROM o),
        |mo AS (SELECT k, 'price' AS col, price AS self_v FROM old
        |  UNION ALL SELECT k, 'priority', priority FROM old
        |  UNION ALL SELECT k, 'status', status FROM old),
        |mn AS (SELECT k, 'price' AS col, price AS other_v FROM nw
        |  UNION ALL SELECT k, 'priority', priority FROM nw
        |  UNION ALL SELECT k, 'status', status FROM nw)
        |SELECT mo.k, mo.col, mo.self_v, mn.other_v
        |FROM mo JOIN mn ON mo.k = mn.k AND mo.col = mn.col
        |WHERE mo.self_v IS DISTINCT FROM mn.other_v
        |ORDER BY mo.k, mo.col""".stripMargin,
    // t54: every flattened field recomputed arithmetically from the
    // source columns (the parse round-trip proof); pmod spelled as the
    // double-% idiom so negatives agree, floor before the cast so
    // DuckDB's round-on-cast can't diverge from Spark's truncate
    "t54_json_normalize" ->
      """WITH e AS (SELECT event_id, user_id, value FROM events),
        |x AS (SELECT e.*, unnest([0, 1]) AS item_pos FROM e)
        |SELECT event_id, user_id AS uid,
        |  't' || CAST(((user_id % 3) + 3) % 3 AS VARCHAR) AS tier,
        |  CAST(item_pos AS INT) AS item_pos,
        |  event_id + item_pos AS sku,
        |  CASE WHEN item_pos = 0
        |       THEN ((CAST(floor(value) AS BIGINT) % 5) + 5) % 5 + 1
        |       ELSE ((event_id % 7) + 7) % 7 + 1 END AS qty
        |FROM x ORDER BY event_id, item_pos""".stripMargin,
    // t53: open/close pinned by the identical (us, event_id) total order
    // (row_number asc/desc = the min/max struct), volume the shared
    // exact-decimal sum convention
    "t53_resample_ohlc" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP)))) AS BIGINT) AS day_s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id, value FROM events),
        |r AS (SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day_s
        |      ORDER BY us, event_id) AS ra,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day_s
        |      ORDER BY us DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT user_id, day_s,
        |  MAX(CASE WHEN ra = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rd = 1 THEN value END) AS close,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS volume,
        |  COUNT(*) AS n_ticks
        |FROM r GROUP BY user_id, day_s ORDER BY user_id, day_s""".stripMargin,
    // t52: identical lag frame + the same pure-selection median
    // network (no arithmetic — output is one of the inputs, bit-exact);
    // warm-up nulls guarded on both engines
    "t52_rolling_median" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    event_id, value FROM events),
        |l AS (SELECT user_id, es, event_id, value,
        |    LAG(value, 1) OVER (PARTITION BY user_id ORDER BY es, event_id) AS l1,
        |    LAG(value, 2) OVER (PARTITION BY user_id ORDER BY es, event_id) AS l2
        |  FROM e)
        |SELECT user_id, es, event_id, value,
        |  CASE WHEN l1 IS NULL OR l2 IS NULL THEN NULL
        |       ELSE greatest(least(value, l1),
        |            least(greatest(value, l1), l2)) END AS roll_med,
        |  CASE WHEN l1 IS NULL OR l2 IS NULL THEN NULL
        |       ELSE least(value, l1, l2) END AS roll_min,
        |  CASE WHEN l1 IS NULL OR l2 IS NULL THEN NULL
        |       ELSE greatest(value, l1, l2) END AS roll_max
        |FROM l ORDER BY user_id, es, event_id""".stripMargin,
    // t51: identical first-occurrence pinning ((us, event_id) min
    // pair), appearance-order codes, one IEEE share division
    "t51_factorize" ->
      """WITH e AS (SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id FROM events),
        |a AS (SELECT event_type, us, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY us, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n FROM e),
        |f AS (SELECT event_type, n, us AS fus, event_id AS feid
        |  FROM a WHERE rn = 1),
        |c AS (SELECT event_type, n, fus,
        |    CAST(ROW_NUMBER() OVER (ORDER BY fus, feid) - 1 AS INT) AS code,
        |    SUM(n) OVER () AS total FROM f)
        |SELECT event_type, code, n,
        |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  fus AS first_us
        |FROM c ORDER BY code""".stripMargin,
    // t50: quantile_cont == Spark's exact interpolating percentile
    // (the q50-proven pairing); identical IEEE z chain, NULLIF guard
    "t50_mad_outliers" ->
      """WITH e AS (SELECT event_type, value FROM events),
        |m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM e GROUP BY 1),
        |d AS (SELECT e.event_type, e.value, m.med,
        |    ABS(e.value - m.med) AS adev
        |  FROM e JOIN m USING (event_type)),
        |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM d GROUP BY 1),
        |z AS (SELECT d.event_type, d.value, d.med, md.mad,
        |    0.6745 * (d.value - d.med) / NULLIF(md.mad, 0.0) AS z
        |  FROM d JOIN md USING (event_type))
        |SELECT event_type, COUNT(*) AS n,
        |  ROUND(MAX(med), 6) AS med_value,
        |  ROUND(MAX(mad), 6) AS mad_value,
        |  COUNT(CASE WHEN ABS(z) > 3.5 THEN 1 END) AS n_outliers,
        |  ROUND(MAX(ABS(z)), 6) AS max_abs_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,
    // t49: identical explicit-lag frames and the identical pinned IEEE
    // sequence; constant-window corr = NULL on both engines (exact
    // all-equal test, no float threshold); no rounding anywhere
    "t49_rolling_corr" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    value AS x, CAST(length(props) AS DOUBLE) AS y
        |  FROM events),
        |l AS (SELECT user_id, es, event_id, x, y,
        |    LAG(x, 1) OVER w AS x1, LAG(x, 2) OVER w AS x2,
        |    LAG(y, 1) OVER w AS y1, LAG(y, 2) OVER w AS y2
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id))
        |SELECT user_id, es, event_id,
        |  CASE WHEN x2 IS NULL THEN NULL ELSE
        |    ((x*y + x1*y1 + x2*y2) - (x+x1+x2) * (y+y1+y2) / 3.0) / 2.0
        |  END AS roll_cov,
        |  CASE WHEN x2 IS NULL OR (x = x1 AND x1 = x2)
        |      OR (y = y1 AND y1 = y2) THEN NULL ELSE
        |    ((x*y + x1*y1 + x2*y2) - (x+x1+x2) * (y+y1+y2) / 3.0) /
        |    sqrt(((x*x + x1*x1 + x2*x2) - (x+x1+x2) * (x+x1+x2) / 3.0) *
        |         ((y*y + y1*y1 + y2*y2) - (y+y1+y2) * (y+y1+y2) / 3.0))
        |  END AS roll_corr
        |FROM l ORDER BY user_id, es, event_id""".stripMargin,
    // t48: identical integer-cents moments (exact at any accumulation
    // order) + the identical pinned division sequence; no rounding
    // t62: conditional-aggregation replay of the pivot — identical
    // cents sums (BIGINT), identical pinned mean sequence
    // (CAST(sc AS DOUBLE)/n/100.0), identical empty-cell null rule
    "t62_pivot_table" ->
      """WITH b AS (SELECT l_returnflag AS rf, l_linestatus AS ls,
        |    CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS c
        |  FROM lineitem),
        |cell AS (SELECT rf,
        |    CAST(COALESCE(SUM(c) FILTER (WHERE ls = 'F'), 0) AS BIGINT)
        |      AS f_sc,
        |    COUNT(*) FILTER (WHERE ls = 'F') AS f_n,
        |    CAST(COALESCE(SUM(c) FILTER (WHERE ls = 'O'), 0) AS BIGINT)
        |      AS o_sc,
        |    COUNT(*) FILTER (WHERE ls = 'O') AS o_n,
        |    CAST(SUM(c) AS BIGINT) AS all_sc, COUNT(*) AS all_n
        |  FROM b GROUP BY rf),
        |m AS (SELECT 'All' AS rf, CAST(SUM(f_sc) AS BIGINT) AS f_sc,
        |    CAST(SUM(f_n) AS BIGINT) AS f_n,
        |    CAST(SUM(o_sc) AS BIGINT) AS o_sc,
        |    CAST(SUM(o_n) AS BIGINT) AS o_n,
        |    CAST(SUM(all_sc) AS BIGINT) AS all_sc,
        |    CAST(SUM(all_n) AS BIGINT) AS all_n FROM cell),
        |u AS (SELECT * FROM cell UNION ALL SELECT * FROM m)
        |SELECT rf, f_sc AS f_sum_cents, f_n,
        |  CASE WHEN f_n > 0 THEN CAST(f_sc AS DOUBLE) / f_n / 100.0 END
        |    AS f_mean,
        |  o_sc AS o_sum_cents, o_n,
        |  CASE WHEN o_n > 0 THEN CAST(o_sc AS DOUBLE) / o_n / 100.0 END
        |    AS o_mean,
        |  all_sc AS all_sum_cents, all_n,
        |  CASE WHEN all_n > 0 THEN CAST(all_sc AS DOUBLE) / all_n / 100.0
        |    END AS all_mean
        |FROM u ORDER BY rf""".stripMargin,
    // t61: identical cents power sums in HUGEINT (exact 128-bit — the
    // internal-only type; only BIGINT/DOUBLE cross the boundary),
    // identical integer kernels, identical pinned IEEE chains
    // (m2^1.5 as m2*sqrt(m2) on BOTH engines — pow is not correctly
    // rounded), identical exact M2=0 and n guards. The M-kernels
    // reach double THROUGH VARCHAR: DuckDB's direct HUGEINT→DOUBLE
    // cast truncates instead of rounding (measured 1 ulp low on a
    // 65-bit M4), while its string→double parse is correctly rounded
    // like Spark's BigDecimal.doubleValue
    "t61_expanding_skew_kurt" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        |      AS HUGEINT) AS c
        |  FROM events),
        |w AS (SELECT user_id, es, event_id,
        |    CAST(COUNT(*) OVER win AS HUGEINT) AS n,
        |    SUM(c) OVER win AS s1,
        |    SUM(c * c) OVER win AS s2,
        |    SUM(c * c * c) OVER win AS s3,
        |    SUM(c * c * c * c) OVER win AS s4
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS UNBOUNDED PRECEDING)),
        |m AS (SELECT user_id, es, event_id, n,
        |    n * s2 - s1 * s1 AS m2i,
        |    n * n * s3 - 3 * n * s1 * s2 + 2 * s1 * s1 * s1 AS m3i,
        |    n * n * n * s4 - 4 * n * n * s1 * s3
        |      + 6 * n * s1 * s1 * s2 - 3 * s1 * s1 * s1 * s1 AS m4i
        |  FROM w)
        |SELECT user_id, es, event_id, CAST(n AS BIGINT) AS n,
        |  CASE WHEN n >= 3 AND m2i > 0 THEN
        |    (sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))
        |      / (CAST(n AS DOUBLE) - 2)) *
        |    (CAST(CAST(m3i AS VARCHAR) AS DOUBLE) /
        |      (CAST(CAST(m2i AS VARCHAR) AS DOUBLE)
        |        * sqrt(CAST(CAST(m2i AS VARCHAR) AS DOUBLE))))
        |  END AS exp_skew,
        |  CASE WHEN n >= 4 AND m2i > 0 THEN
        |    ((CAST(n AS DOUBLE) + 1) * (CAST(n AS DOUBLE) - 1)
        |      / ((CAST(n AS DOUBLE) - 2) * (CAST(n AS DOUBLE) - 3))) *
        |    (CAST(CAST(m4i AS VARCHAR) AS DOUBLE) /
        |      (CAST(CAST(m2i AS VARCHAR) AS DOUBLE)
        |        * CAST(CAST(m2i AS VARCHAR) AS DOUBLE)))
        |    - 3.0 * (CAST(n AS DOUBLE) - 1) * (CAST(n AS DOUBLE) - 1)
        |      / ((CAST(n AS DOUBLE) - 2) * (CAST(n AS DOUBLE) - 3))
        |  END AS exp_kurt
        |FROM m ORDER BY user_id, es, event_id""".stripMargin,
    "t48_expanding" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    value,
        |    CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |w AS (SELECT user_id, es, event_id, value,
        |    COUNT(*) OVER win AS n,
        |    CAST(SUM(cents) OVER win AS BIGINT) AS sc,
        |    CAST(SUM(cents * cents) OVER win AS BIGINT) AS scc,
        |    MAX(value) OVER win AS exp_max
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS UNBOUNDED PRECEDING))
        |SELECT user_id, es, event_id, n,
        |  CAST(sc AS DOUBLE) / n / 100.0 AS exp_mean,
        |  CAST(sc AS DOUBLE) / 100.0 AS exp_sum,
        |  exp_max,
        |  CASE WHEN n < 2 THEN NULL ELSE
        |    sqrt(CAST(CAST(n AS DECIMAL(19,0)) * CAST(scc AS DECIMAL(19,0))
        |        - CAST(sc AS DECIMAL(19,0)) * CAST(sc AS DECIMAL(19,0))
        |        AS DOUBLE)
        |      / CAST(n * (n - 1) AS DOUBLE) / 10000.0) END AS exp_std
        |FROM w ORDER BY user_id, es, event_id""".stripMargin,
    // t47: the contract grid is deterministic given lineitem's fixed
    // physical schema — pinned VALUES like t1/t3
    "t47_union_typecheck" ->
      """SELECT * FROM (VALUES
        | ('l_comment','string','missing','missing',false),
        | ('l_orderkey','int32 | int64','int64','match',true),
        | ('l_quantity','int64','float64','mismatch',false),
        | ('l_returnflag','string','string','match',true),
        | ('l_shipdate','','datetime','extra',true)
        |) t(col_name, declared, actual, status, ok) ORDER BY col_name""".stripMargin,
    // t46: categorical dictionary = sorted-distinct rank; sparse runs =
    // gaps-and-islands (event_id − row_number is run identity); the
    // round-trip mismatch count is structurally 0 — the oracle pins it
    "t46_sparse_categorical" ->
      """WITH e AS (SELECT event_id, event_type FROM events
        |    WHERE event_id < 2000),
        |d AS (SELECT event_type AS value,
        |    CAST(ROW_NUMBER() OVER (ORDER BY event_type) - 1 AS INT) AS code
        |  FROM (SELECT DISTINCT event_type FROM e)),
        |runs AS (SELECT event_type,
        |    COUNT(*) AS n_rows,
        |    COUNT(DISTINCT event_id - rn) AS n_runs
        |  FROM (SELECT event_type, event_id,
        |      ROW_NUMBER() OVER (PARTITION BY event_type
        |        ORDER BY event_id) AS rn FROM e)
        |  GROUP BY event_type)
        |SELECT d.value, d.code, runs.n_rows, runs.n_runs,
        |  CAST(0 AS BIGINT) AS n_bad
        |FROM d JOIN runs ON runs.event_type = d.value
        |ORDER BY d.code""".stripMargin,
    // t44: same seed-first linear fold — list_reduce uses element 1 as
    // the accumulator seed exactly like aggregate(slice(vals,2,i), vals[1])
    "t44_ewm" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    event_id, value FROM events),
        |g AS (SELECT user_id,
        |    list(value ORDER BY es, event_id, value) AS vals,
        |    list(event_id ORDER BY es, event_id, value) AS eids
        |  FROM e GROUP BY user_id),
        |p AS (SELECT user_id, vals, eids,
        |    unnest(generate_series(1, len(vals))) AS i FROM g)
        |SELECT user_id, eids[i] AS event_id, vals[i] AS value,
        |  list_reduce(vals[1:i],
        |    (acc, x) -> acc * 0.7 + x * 0.3) AS ewm
        |FROM p ORDER BY user_id, event_id""".stripMargin,
    // t45: identical lag frame + sums-of-squares identity, same IEEE
    // op order; explicit NULL guard mirrors the Spark-side when()
    "t45_rolling_std" ->
      """WITH e AS (SELECT user_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
        |    event_id, value FROM events),
        |l AS (SELECT user_id, es, event_id, value,
        |    lag(value, 1) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS l1,
        |    lag(value, 2) OVER (PARTITION BY user_id
        |      ORDER BY es, event_id) AS l2
        |  FROM e)
        |SELECT user_id, es, event_id, value,
        |  (value + l1 + l2) / 3.0 AS roll_mean,
        |  CASE WHEN l1 IS NULL OR l2 IS NULL THEN NULL
        |    ELSE sqrt(GREATEST(0.0,
        |      (value * value + l1 * l1 + l2 * l2
        |        - (value + l1 + l2) * (value + l1 + l2) / 3.0) / 2.0))
        |    END AS roll_std
        |FROM l ORDER BY user_id, es, event_id""".stripMargin,
    // t37: identical IEEE sequence — decimal moments cast to DOUBLE,
    // then mean/var/sqrt/divide in the same order; sqrt is correctly
    // rounded (IEEE) so no cross-engine drift
    "t37_group_transform" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |    CAST(value AS DECIMAL(12,2)) AS v FROM events),
        |st AS (SELECT event_type, COUNT(*) AS n,
        |    CAST(SUM(v) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v * v AS DECIMAL(34,4))) AS DOUBLE) AS sq
        |  FROM e GROUP BY 1),
        |j AS (SELECT e.event_id, e.event_type, e.value,
        |    s / n AS mean, (sq - s * s / n) / n AS variance
        |  FROM e JOIN st ON e.event_type = st.event_type)
        |SELECT event_id, event_type, value,
        |  ROUND((value - mean) / sqrt(variance), 6) AS z,
        |  abs((value - mean) / sqrt(variance)) > 2 AS outlier
        |FROM j ORDER BY event_id""".stripMargin,
    // t38: same three policies, same (es, event_id) pinning
    "t38_drop_duplicates" ->
      """WITH e AS (SELECT user_id, event_type, event_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        |  FROM events),
        |r AS (SELECT user_id, event_type, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY es ASC, event_id ASC) AS rf,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |      ORDER BY es DESC, event_id DESC) AS rl,
        |    COUNT(*) OVER (PARTITION BY user_id, event_type) AS cnt
        |  FROM e)
        |SELECT 'first' AS policy, user_id, event_type, event_id
        |  FROM r WHERE rf = 1
        |UNION ALL
        |SELECT 'last', user_id, event_type, event_id FROM r WHERE rl = 1
        |UNION ALL
        |SELECT 'unique', user_id, event_type, event_id FROM r WHERE cnt = 1
        |ORDER BY policy, user_id, event_type""".stripMargin,
    // t42: pinned-level indicator projection, no discovery scan
    "t42_get_dummies" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS pr_0,
        |  CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END AS pr_1,
        |  CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END AS pr_2,
        |  CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END AS pr_3,
        |  CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END AS pr_4
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // t43: per-row guards — same IEEE compares and arithmetic, no aggs
    "t43_clip_where" ->
      """SELECT o_orderkey, o_totalprice AS price,
        |  LEAST(GREATEST(o_totalprice, 50000.0), 200000.0) AS clipped,
        |  CASE WHEN o_totalprice >= 100000.0 THEN o_totalprice
        |    ELSE -1.0 END AS where_hi,
        |  CASE WHEN o_totalprice >= 100000.0 THEN -1.0
        |    ELSE o_totalprice END AS mask_hi,
        |  o_totalprice BETWEEN 80000.0 AND 120000.0 AS in_band,
        |  ABS(o_totalprice - 150000.0) AS dist_150k
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    // t41: FULL OUTER + CASE on key nullability; nulls-first ordering
    // pinned on both engines
    "t41_merge_indicator" ->
      """SELECT o.o_orderkey, o.o_custkey, c.c_custkey, c.c_mktsegment,
        |  CASE WHEN o.o_custkey IS NOT NULL AND c.c_custkey IS NOT NULL
        |      THEN 'both'
        |    WHEN o.o_custkey IS NOT NULL THEN 'left_only'
        |    ELSE 'right_only' END AS merge_ind
        |FROM (SELECT o_orderkey, o_custkey FROM orders
        |      WHERE o_orderkey % 4 = 0) o FULL OUTER JOIN
        |  (SELECT c_custkey, c_mktsegment FROM customer
        |   WHERE c_custkey % 3 = 0) c
        |  ON o.o_custkey = c.c_custkey
        |ORDER BY o_orderkey ASC NULLS FIRST, c_custkey ASC NULLS FIRST"""
        .stripMargin,
    // t40: instants → IANA wall clocks; epoch(naive-local) − es gives
    // the realized offset on both engines (naive read back as UTC)
    "t40_timezone" ->
      """WITH e AS (SELECT event_id,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
        |      + (event_id % 365) * 86400 AS es
        |  FROM events)
        |SELECT event_id, es,
        |  strftime(to_timestamp(es) AT TIME ZONE 'UTC',
        |    '%Y-%m-%d %H:%M:%S') AS utc_str,
        |  strftime(to_timestamp(es) AT TIME ZONE 'America/New_York',
        |    '%Y-%m-%d %H:%M:%S') AS ny_str,
        |  CAST((epoch(to_timestamp(es) AT TIME ZONE 'America/New_York')
        |    - es) / 60 AS INT) AS ny_offset_min,
        |  strftime(to_timestamp(es) AT TIME ZONE 'Asia/Kolkata',
        |    '%Y-%m-%d %H:%M:%S') AS kolkata_str,
        |  CAST((epoch(to_timestamp(es) AT TIME ZONE 'Asia/Kolkata')
        |    - es) / 60 AS INT) AS kolkata_offset_min
        |FROM e ORDER BY event_id""".stripMargin,
    // t39: conditional-count crosstab + UNION margin row; shares divide
    // the same longs in the same order, round-6
    "t39_crosstab" ->
      """WITH w AS (SELECT o_orderpriority AS priority,
        |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS f,
        |    SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS o,
        |    SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS p
        |  FROM orders GROUP BY 1),
        |m AS (SELECT priority, f, o, p, f + o + p AS rt FROM w
        |  UNION ALL
        |  SELECT 'All', SUM(f), SUM(o), SUM(p), SUM(f + o + p) FROM w)
        |SELECT priority, CAST(f AS BIGINT) AS f_cnt, CAST(o AS BIGINT) AS o_cnt,
        |  CAST(p AS BIGINT) AS p_cnt,
        |  CAST(rt AS BIGINT) AS row_total,
        |  ROUND(CAST(f AS DOUBLE) / rt, 6) AS f_share,
        |  ROUND(CAST(o AS DOUBLE) / rt, 6) AS o_share,
        |  ROUND(CAST(p AS DOUBLE) / rt, 6) AS p_share
        |FROM m ORDER BY priority""".stripMargin,
    // t36: list-function-for-lambda replay; both sides sort before any
    // order-sensitive read, so collect order can't leak
    "t36_array_ops" ->
      """WITH per AS (SELECT l_orderkey,
        |    list_sort(list(CAST(l_quantity AS INT))) AS qs
        |  FROM lineitem GROUP BY 1)
        |SELECT l_orderkey,
        |  array_to_string(qs, ',') AS qs_str,
        |  CAST(len(qs) AS INT) AS n_items,
        |  CAST(list_sum(qs) AS BIGINT) AS q_sum,
        |  CAST(len(list_filter(qs, x -> x > 25)) AS INT) AS n_big,
        |  list_contains(qs, 50) AS has_50,
        |  array_to_string(list_transform(qs, x -> x * 2), ',') AS doubled,
        |  qs[1] AS q_min,
        |  qs[-1] AS q_max
        |FROM per ORDER BY l_orderkey""".stripMargin,
    // t35: function-for-function replay (1-based substr both sides)
    "t35_str_accessor" ->
      """SELECT c_custkey,
        |  upper(c_name) AS nm_upper,
        |  lower(c_mktsegment) AS seg_lower,
        |  reverse(c_name) AS nm_rev,
        |  lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS key_zfill,
        |  rpad(c_mktsegment, 12, '.') AS seg_pad,
        |  substr(c_name, 1, 4) AS nm_slice,
        |  contains(c_mktsegment, 'I') AS seg_has_i,
        |  starts_with(c_name, 'Customer') AS nm_is_cust,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS nm_digits,
        |  ltrim(regexp_extract(c_name, '([0-9]+)', 1), '0')
        |    AS nm_digits_stripped,
        |  split_part(c_name, '#', 2) AS nm_after_hash,
        |  repeat(substr(c_mktsegment, 1, 2), 3) AS seg_echo,
        |  length(c_name) AS nm_len,
        |  regexp_replace(c_name, '^Customer', 'Cust') AS nm_short
        |FROM customer ORDER BY c_custkey""".stripMargin,
    // t32: UNION ALL replay of the unpivot (same common-double cast)
    "t32_melt" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity,
        |    l_extendedprice, l_discount, l_tax
        |  FROM lineitem WHERE l_orderkey % 20 = 0)
        |SELECT l_orderkey, l_linenumber, variable, value FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS variable,
        |    CAST(l_quantity AS DOUBLE) AS value FROM li
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |    CAST(l_extendedprice AS DOUBLE) FROM li
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
        |    CAST(l_discount AS DOUBLE) FROM li
        |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
        |    CAST(l_tax AS DOUBLE) FROM li)
        |ORDER BY l_orderkey, l_linenumber, variable""".stripMargin,
    // t33: same four tie policies; average = min + (ties-1)/2 is the
    // mean of the tie positions in both engines
    "t33_rank_methods" ->
      """SELECT p_partkey, p_brand, p_size,
        |  RANK() OVER w AS r_min,
        |  DENSE_RANK() OVER w AS r_dense,
        |  ROW_NUMBER() OVER (PARTITION BY p_brand
        |    ORDER BY p_size, p_partkey) AS r_first,
        |  RANK() OVER w + (COUNT(*) OVER (PARTITION BY p_brand, p_size)
        |    - 1) / 2.0 AS r_avg,
        |  ROUND((RANK() OVER w + (COUNT(*) OVER (PARTITION BY p_brand,
        |      p_size) - 1) / 2.0)
        |    / COUNT(*) OVER (PARTITION BY p_brand), 6) AS r_pct
        |FROM part
        |WINDOW w AS (PARTITION BY p_brand ORDER BY p_size)
        |ORDER BY p_partkey""".stripMargin,
    // t34: decimal-exact diff/cumsum; pct_change is the identical IEEE
    // double division; first-row lag is NULL in both engines
    "t34_shift_diff" ->
      """WITH e AS (SELECT user_id, event_id, value,
        |    CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        |  FROM events),
        |l AS (SELECT user_id, es, event_id, value,
        |    LAG(value) OVER (PARTITION BY user_id ORDER BY es, event_id)
        |      AS v_prev
        |  FROM e)
        |SELECT user_id, es, event_id, v_prev,
        |  CAST(CAST(value AS DECIMAL(12,2)) - CAST(v_prev AS DECIMAL(12,2))
        |    AS DOUBLE) AS diff,
        |  value / NULLIF(v_prev, 0) - 1.0 AS pct_change,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2)))
        |    OVER (PARTITION BY user_id ORDER BY es, event_id
        |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_sum,
        |  MAX(value) OVER (PARTITION BY user_id ORDER BY es, event_id
        |    ROWS UNBOUNDED PRECEDING) AS cum_max
        |FROM l ORDER BY user_id, es, event_id""".stripMargin,
    // t31: identical edge derivations (min/max; quantile_cont ==
    // Spark's exact interpolating percentile) and the identical
    // assignment expressions — same IEEE sequences, same boundary
    // semantics (rightmost inclusive; (e_{i-1}, e_i] quartiles)
    "t31_cut_qcut" ->
      """WITH st AS (SELECT CAST(MIN(value) AS DOUBLE) AS lo,
        |    CAST(MAX(value) AS DOUBLE) AS hi,
        |    quantile_cont(value, 0.25) AS e1, quantile_cont(value, 0.5) AS e2,
        |    quantile_cont(value, 0.75) AS e3
        |  FROM events),
        |cb AS (SELECT CASE WHEN hi = lo THEN 0
        |    ELSE CAST(LEAST(FLOOR((CAST(value AS DOUBLE) - lo) /
        |      ((hi - lo) / 8)), 7) AS INT) END AS bin, value
        |  FROM events, st),
        |qb AS (SELECT CASE WHEN CAST(value AS DOUBLE) <= e1 THEN 0
        |    WHEN CAST(value AS DOUBLE) <= e2 THEN 1
        |    WHEN CAST(value AS DOUBLE) <= e3 THEN 2 ELSE 3 END AS bin, value
        |  FROM events, st)
        |SELECT 'cut' AS kind, bin, COUNT(*) AS n,
        |  MIN(value) AS vmin, MAX(value) AS vmax,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM cb GROUP BY bin
        |UNION ALL
        |SELECT 'qcut' AS kind, bin, COUNT(*) AS n,
        |  MIN(value) AS vmin, MAX(value) AS vmax,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM qb GROUP BY bin
        |ORDER BY kind, bin""".stripMargin,
    // the raw strings round-trip losslessly, so the oracle is simply
    // the original typed table — any inference or cast error diverges
    "t28_ingest_infer" ->
      """SELECT o_orderkey AS k, o_totalprice AS price,
        |  o_orderdate AS ts, o_orderpriority AS prio
        |FROM orders ORDER BY k""".stripMargin,
    // t30: identical IEEE op order on identical parquet doubles →
    // bit-exact blend; leading/trailing nulls stay null on both sides
    "t30_interpolate" ->
      """WITH src AS (SELECT o_custkey AS g, o_orderkey AS x,
        |    CASE WHEN o_orderkey % 5 < 2 THEN NULL
        |         ELSE o_totalprice END AS v
        |  FROM orders),
        |n AS (SELECT g, x, v,
        |    LAST_VALUE(v IGNORE NULLS) OVER wp AS y0,
        |    LAST_VALUE(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
        |      OVER wp AS x0,
        |    FIRST_VALUE(v IGNORE NULLS) OVER wn AS y1,
        |    FIRST_VALUE(CASE WHEN v IS NOT NULL THEN x END IGNORE NULLS)
        |      OVER wn AS x1
        |  FROM src
        |  WINDOW wp AS (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY g ORDER BY x
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT g, x,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN y0 IS NULL OR y1 IS NULL THEN NULL
        |       ELSE y0 + (y1 - y0) * (x - x0) / (x1 - x0) END AS v_interp,
        |  v IS NULL AS was_null
        |FROM n ORDER BY g, x""".stripMargin,
    // t29: good column casts (identity on the key), bad column stays
    // the original strings — whole-column ignore semantics
    "t29_cast_ignore" ->
      """SELECT o_orderkey, o_orderkey AS k_good,
        |  CAST(o_orderkey AS VARCHAR) ||
        |    CASE WHEN o_orderkey % 2 = 1 THEN 'x' ELSE '' END AS k_bad
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "t27_profile" -> Seq("doc_id", "lang", "source", "n_chars").map(c =>
      s"""SELECT '$c' AS "column", COUNT(*) AS n,
         |  COUNT(*) - COUNT($c) AS n_null, COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS VARCHAR) AS min_s, CAST(MAX($c) AS VARCHAR) AS max_s
         |FROM documents""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"column\""),
    "t26_sparse_compute" ->
      """WITH e AS (SELECT event_id,
        |    CAST(CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1
        |      WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END AS BIGINT) AS v
        |  FROM events WHERE event_id < 5000),
        |m AS (SELECT event_id, v * 2 + 1 AS mv FROM e),
        |isl AS (SELECT COUNT(*) AS n_runs FROM (
        |  SELECT DISTINCT v, event_id - ROW_NUMBER() OVER (PARTITION BY v ORDER BY event_id) AS grp
        |  FROM e))
        |SELECT (SELECT COUNT(*) FROM m) AS n,
        |  (SELECT n_runs FROM isl) AS n_runs,
        |  (SELECT CAST(SUM(mv) AS BIGINT) FROM m) AS sum_v,
        |  (SELECT MIN(mv) FROM m) AS min_v,
        |  (SELECT MAX(mv) FROM m) AS max_v,
        |  (SELECT COUNT(*) FROM m WHERE mv = 1) AS n_fill,
        |  (SELECT COUNT(*) FROM m WHERE mv != 1) AS nnz""".stripMargin,
    "t25_object_roundtrip" ->
      """WITH li AS (SELECT l_orderkey, l_linenumber, l_extendedprice,
        |    l_returnflag, CAST(l_shipdate AS TIMESTAMP) AS sd
        |  FROM lineitem WHERE l_orderkey <= 300),
        |t AS (SELECT *, CASE CAST(l_linenumber % 4 AS INT)
        |    WHEN 0 THEN 'int:' || CAST(l_orderkey AS VARCHAR)
        |    WHEN 1 THEN 'float:' || CAST(l_extendedprice AS VARCHAR)
        |    WHEN 2 THEN 'bool:' ||
        |      (CASE WHEN l_returnflag = 'R' THEN 'true' ELSE 'false' END)
        |    ELSE 'datetime:' || strftime(sd, '%Y-%m-%d %H:%M:%S') END AS obj
        |  FROM li),
        |d AS (SELECT *, split_part(obj, ':', 1) AS tag,
        |    substr(obj, strpos(obj, ':') + 1) AS payload FROM t)
        |SELECT l_orderkey, l_linenumber, tag,
        |  CASE WHEN tag = 'int' THEN CAST(payload AS BIGINT) END AS v_int,
        |  CASE WHEN tag = 'float' THEN CAST(payload AS DOUBLE) END AS v_float,
        |  CASE WHEN tag = 'bool'
        |    THEN (CASE WHEN payload = 'true' THEN 1 ELSE 0 END) END AS v_bool,
        |  CASE WHEN tag = 'datetime'
        |    THEN epoch_us(strptime(payload, '%Y-%m-%d %H:%M:%S')) END AS v_ts_us,
        |  CASE WHEN tag = 'int' THEN CAST(payload AS BIGINT) = l_orderkey
        |       WHEN tag = 'float' THEN CAST(payload AS DOUBLE) = l_extendedprice
        |       WHEN tag = 'bool' THEN
        |         (CASE WHEN payload = 'true' THEN 1 ELSE 0 END = 1) = (l_returnflag = 'R')
        |       ELSE epoch_us(strptime(payload, '%Y-%m-%d %H:%M:%S')) = epoch_us(sd)
        |  END AS rt_ok
        |FROM d ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "t23_parse_datetime" ->
      """WITH b AS (SELECT o_orderkey, CAST(o_orderdate AS TIMESTAMP) AS d,
        |    CAST(o_orderdate AS TIMESTAMP) + INTERVAL (360) MONTH AS d30
        |  FROM orders WHERE o_orderkey <= 400),
        |f AS (SELECT o_orderkey,
        |    strftime(d, '%Y-%m-%d %H:%M:%S') AS iso_s,
        |    strftime(d, '%m/%d/%Y') AS us_s,
        |    strftime(d, '%d/%m/%Y') AS df_s,
        |    strftime(d30, '%y/%m/%d') AS yf_s,
        |    CASE WHEN o_orderkey % 3 = 0 THEN 'not a date'
        |         ELSE strftime(d, '%Y-%m-%d') END AS mixed_s
        |  FROM b)
        |SELECT o_orderkey, iso_s,
        |  epoch_us(strptime(iso_s, '%Y-%m-%d %H:%M:%S')) AS us_iso,
        |  epoch_us(strptime(us_s, '%m/%d/%Y')) AS us_fmt,
        |  epoch_us(strptime(df_s, '%d/%m/%Y')) AS us_dayfirst,
        |  epoch_us(strptime(yf_s, '%y/%m/%d')) AS us_yearfirst,
        |  epoch_us(timezone('America/New_York',
        |    strptime(iso_s, '%Y-%m-%d %H:%M:%S'))) AS us_tz,
        |  CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |       ELSE epoch_us(strptime(mixed_s, '%Y-%m-%d')) END AS us_coerce
        |FROM f ORDER BY o_orderkey""".stripMargin,
    "t24_to_string" ->
      """WITH b AS (SELECT o_orderkey,
        |    o_orderkey * (CASE WHEN o_orderkey % 2 = 1 THEN -1 ELSE 1 END) AS v,
        |    CAST(o_orderdate AS TIMESTAMP) AS d
        |  FROM orders WHERE o_orderkey <= 500),
        |m AS (SELECT *, ABS(v) AS mag,
        |    CASE WHEN v < 0 THEN '-' ELSE '' END AS sg FROM b)
        |SELECT o_orderkey, v,
        |  sg || format('{:x}', mag) AS hex_s,
        |  sg || format('{:b}', mag) AS bin_s,
        |  sg || format('{:o}', mag) AS oct_s,
        |  CASE WHEN o_orderkey % 2 = 0 THEN 'true' ELSE 'false' END AS bool_s,
        |  strftime(d, '%Y-%m-%d %H:%M:%S') AS ts_s,
        |  v AS rt
        |FROM m ORDER BY o_orderkey""".stripMargin,
    "t21_unit_calendar" ->
      """WITH b AS (SELECT o_orderkey, CAST(o_orderkey % 480 AS INT) AS nm,
        |             CAST(o_orderkey % 40 AS INT) AS ny
        |           FROM orders WHERE o_orderkey <= 500)
        |SELECT o_orderkey, nm, ny,
        |  CAST(epoch(TIMESTAMP '1960-01-01 00:00:00' + INTERVAL (nm) MONTH) AS BIGINT) AS ts_m,
        |  CAST(epoch(TIMESTAMP '1970-01-01 00:00:00' + INTERVAL (ny * 12) MONTH) AS BIGINT) AS ts_y,
        |  CAST(epoch(TIMESTAMP '1858-11-16 12:00:00' + INTERVAL (nm * 3) MONTH) AS BIGINT) AS ts_q,
        |  CAST(epoch(TIMESTAMP '1899-12-30 00:00:00' + INTERVAL (nm) MONTH) AS BIGINT) AS ts_l,
        |  CAST(epoch(TIMESTAMP '1980-01-06 00:00:00') AS BIGINT) + CAST(nm AS BIGINT) * 5 AS ts_s5,
        |  CAST(nm AS BIGINT) AS m_rt,
        |  CAST(ny AS BIGINT) AS y_rt
        |FROM b ORDER BY o_orderkey""".stripMargin,
    "t22_parse_strings" -> t22OracleSql,
    "t20_round_decimal" -> {
      // exact integer-cents mirror: rounding a 2-dec value to 1 decimal
      // == round_div(cents, 10, rule)/10, reusing the divSql formulas
      val ruleCols = Rounding.validRules
        .map(r => s"  CAST(${divBodySql(r)} AS DOUBLE) / 10 AS d_$r")
        .mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, CAST(a AS DOUBLE) / 100 AS x,
         |$ruleCols
         |FROM (SELECT *, ABS(m) AS mag,
         |    CAST((a - m) / b AS BIGINT) AS qf,
         |    CAST((a - m) / b AS BIGINT) + (CASE WHEN m = 0 THEN 0 ELSE 1 END) AS qc
         |  FROM (SELECT l_orderkey, l_linenumber, a, b, ((a % b) + b) % b AS m
         |    FROM (SELECT l_orderkey, l_linenumber,
         |      CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         |        * (CASE WHEN l_linenumber % 2 = 0 THEN -1 ELSE 1 END) AS a,
         |      CAST(10 AS BIGINT) AS b
         |      FROM lineitem WHERE l_orderkey <= 100)))
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "t1_detect_types" ->
      """SELECT * FROM (VALUES
        | ('phys_double','float64'), ('phys_long','int64'), ('s_bool','bool'),
        | ('s_date','datetime'), ('s_float','float64'), ('s_int','int64'),
        | ('s_str','string')) t(col_name, detected) ORDER BY col_name""".stripMargin,
    "t2_resolve_spec" ->
      """SELECT * FROM (VALUES
        | ('?','bool','bool'), ('NA','missing','missing'), ('bool','bool','bool'),
        | ('categorical[string]','categorical[string]','string'),
        | ('complex64','complex64','complex'), ('datetime[UTC]','datetime[UTC]','datetime'),
        | ('decimal(10,2)','decimal(10,2)','decimal'), ('float32','float32','float'),
        | ('half','float16','float'), ('i8','int64','int'),
        | ('object','object','object'),
        | ('sparse[categorical[int8]]','sparse[categorical[int8]]','int'),
        | ('sparse[int, 0]','sparse[int64, 0]','int'), ('str','string','string'),
        | ('timedelta','timedelta','timedelta'), ('uint16','uint16','int'),
        | ('int | float','int64 | float64','union'),
        | ('bool | sparse[int8]','bool | sparse[int8]','union'),
        | ('foo: int32','Union[foo: int32]','union'),
        | ('foo: int32 | int64, bar: bool','Union[foo: int32 | int64, bar: bool]','union'),
        | ('Union[foo: categorical[string], bar: decimal]','Union[foo: categorical[string], bar: decimal(38,18)]','union'),
        | ('int8, uint32','int8 | uint32','union'),
        | ('Union[int16, int32 | int64]','int16 | int32 | int64','union')
        |) t(spec, canonical, family) ORDER BY spec""".stripMargin,
    "t3_typecheck" ->
      """SELECT * FROM (VALUES
        | ('l_linenumber','int32','int32',true), ('l_linestatus','string','string',true),
        | ('l_orderkey','int64','int64',true), ('l_quantity','int64','float64',false),
        | ('l_returnflag','bool','string',false), ('l_shipdate','datetime','datetime',true)
        |) t(col_name, expected, actual, ok) ORDER BY col_name""".stripMargin,
    "t4_cast_int" ->
      s"""SELECT l_orderkey, l_linenumber,
         |  CASE WHEN ${roundSql("l_quantity", "half_even", 0)} BETWEEN -128 AND 127
         |    THEN CAST(${roundSql("l_quantity", "half_even", 0)} AS TINYINT) END AS qty_i8,
         |  CASE WHEN ${roundSql("l_extendedprice", "floor", 0)} BETWEEN -2147483648 AND 2147483647
         |    THEN CAST(${roundSql("l_extendedprice", "floor", 0)} AS INTEGER) END AS price_i32,
         |  CASE WHEN ${roundSql("l_extendedprice", "half_up", 0)} BETWEEN -128 AND 127
         |    THEN CAST(${roundSql("l_extendedprice", "half_up", 0)} AS TINYINT) END AS price_i8
         |FROM lineitem WHERE l_orderkey <= 200 ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "t5_cast_bool" ->
      """SELECT COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_true,
        |  COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_false,
        |  COUNT(CASE WHEN o_orderstatus NOT IN ('F','O') THEN 1 END) AS n_null
        |FROM orders""".stripMargin,
    "t6_cast_string_num" ->
      s"""WITH r AS (SELECT CASE
         |  WHEN l_linenumber % 4 = 0 THEN CAST(l_extendedprice AS VARCHAR)
         |  WHEN l_linenumber % 4 = 1 THEN '  ' || CAST(l_quantity AS VARCHAR) || ' '
         |  WHEN l_linenumber % 4 = 2 THEN 'N/A'
         |  ELSE '$$' || CAST(l_extendedprice AS VARCHAR) END AS raw FROM lineitem),
         |p AS (SELECT CASE WHEN regexp_matches(TRIM(raw), '$floatReSql')
         |  THEN CAST(TRIM(raw) AS DOUBLE) END AS v FROM r)
         |SELECT COUNT(v) AS n_parsed, COUNT(CASE WHEN v IS NULL THEN 1 END) AS n_failed,
         |  CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total FROM p""".stripMargin,
    "t7_cast_datetime" ->
      """SELECT event_id, es, es * 1000000 AS us_epoch,
        |  1704067200000000 + es * 60000000 AS us_minutes
        |FROM (SELECT event_id,
        |  CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        |  FROM events WHERE event_id < 100) ORDER BY event_id""".stripMargin,
    "t8_cast_timedelta" ->
      """SELECT o_orderkey,
        |  CAST(FLOOR((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 86400) AS BIGINT) AS d_days,
        |  CAST(FLOOR((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 604800) AS BIGINT) AS d_weeks,
        |  CAST(FLOOR((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 3600) AS BIGINT) AS d_hours,
        |  CAST(FLOOR((epoch(o_orderdate) - epoch(TIMESTAMP '1995-01-01')) / 86400) AS BIGINT) * 86400000000 AS td_us
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,
    "t9_cast_decimal" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price_dec,
        |  CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DECIMAL(20,2)) AS DOUBLE) AS price_x2
        |FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey""".stripMargin,
    "t10_round_rules" -> {
      val ruleCols = Rounding.validRules
        .map(r => s"  ${roundSql("x", r, 1)} AS r_$r").mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, x,
         |$ruleCols
         |FROM (SELECT l_orderkey, l_linenumber,
         |  l_extendedprice * (CASE WHEN l_linenumber % 2 = 0 THEN -1.0 ELSE 1.0 END) AS x
         |  FROM lineitem WHERE l_orderkey <= 100)
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "t11_round_div" -> {
      val ruleCols = Rounding.validRules.map(r => "  " + divSql(r)).mkString(",\n")
      s"""SELECT l_orderkey, l_linenumber, a, b,
         |$ruleCols
         |FROM (SELECT *, ABS(m) AS mag,
         |    CAST((a - m) / b AS BIGINT) AS qf,
         |    CAST((a - m) / b AS BIGINT) + (CASE WHEN m = 0 THEN 0 ELSE 1 END) AS qc
         |  FROM (SELECT l_orderkey, l_linenumber, a, b, ((a % b) + b) % b AS m
         |    FROM (SELECT l_orderkey, l_linenumber,
         |      CAST(l_quantity AS BIGINT) * (CASE WHEN l_linenumber % 2 = 0 THEN -1 ELSE 1 END) AS a,
         |      CAST(l_linenumber AS BIGINT) AS b
         |      FROM lineitem WHERE l_orderkey <= 100)))
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    },
    "t12_tolerance_snap" ->
      s"""SELECT event_id, value,
         |  CASE WHEN ABS(value - ${roundSql("value", "half_up", 0)}) <= 0.3
         |    THEN ${roundSql("value", "half_up", 0)} ELSE value END AS snapped
         |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin,
    "t13_downcast" -> {
      val intCase =
        """CASE WHEN MIN(%s) >= -128 AND MAX(%s) <= 127 THEN 'int8'
          | WHEN MIN(%s) >= -32768 AND MAX(%s) <= 32767 THEN 'int16'
          | WHEN MIN(%s) >= -2147483648 AND MAX(%s) <= 2147483647 THEN 'int32'
          | ELSE 'int64' END""".stripMargin
      def one(c: String, isFloat: Boolean): String = {
        val ic = intCase.replace("%s", c)
        val target =
          if (!isFloat) ic
          else
            s"""CASE WHEN COUNT(CASE WHEN $c != FLOOR($c) THEN 1 END) = 0 THEN $ic
               | WHEN COUNT(CASE WHEN $c != CAST(CAST($c AS REAL) AS DOUBLE) THEN 1 END) = 0
               |   THEN 'float32' ELSE 'float64' END""".stripMargin
        s"""SELECT '$c' AS col_name, CAST(MIN($c) AS DOUBLE) AS lo,
           | CAST(MAX($c) AS DOUBLE) AS hi, $target AS target FROM lineitem"""
          .stripMargin.replaceAll("\n", " ")
      }
      Seq(one("l_orderkey", false), one("l_partkey", false),
        one("l_suppkey", false), one("l_linenumber", false),
        one("l_quantity", true), one("l_extendedprice", true),
        one("l_discount", true))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "t14_missing" ->
      """WITH w AS (SELECT CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END AS q
        | FROM lineitem)
        |SELECT COUNT(*) AS n, COUNT(CASE WHEN q IS NULL THEN 1 END) AS n_null,
        |  COUNT(q) AS n_valid,
        |  CAST(SUM(CAST(COALESCE(q, 0.0) AS DECIMAL(12,2))) AS DOUBLE) AS sum_filled,
        |  CAST(SUM(CAST(q AS DECIMAL(12,2))) AS DOUBLE) / COUNT(q) AS avg_skipna
        |FROM w""".stripMargin,
    "t15_categorical" ->
      """SELECT value, CAST(DENSE_RANK() OVER (ORDER BY value) - 1 AS INTEGER) AS code, n
        |FROM (SELECT l_returnflag AS value, COUNT(*) AS n FROM lineitem GROUP BY 1)
        |ORDER BY code""".stripMargin,
    "t16_sparse" ->
      """WITH e AS (SELECT event_id, event_type FROM events WHERE event_id < 2000),
        |g AS (SELECT event_id, event_type,
        |  ROW_NUMBER() OVER (ORDER BY event_id)
        |    - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id) AS grp
        | FROM e)
        |SELECT event_type AS value, MIN(event_id) AS start_id, COUNT(*) AS run_len
        |FROM g GROUP BY event_type, grp ORDER BY start_id""".stripMargin,
    "t17_time_units" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
        |  CAST(day(last_day(o_orderdate)) AS INTEGER) AS dim,
        |  (year(o_orderdate) % 4 = 0 AND year(o_orderdate) % 100 != 0)
        |    OR year(o_orderdate) % 400 = 0 AS leap,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ord,
        |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS ord_rt
        |FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey""".stripMargin,
    "t18_cast_complex" ->
      """SELECT c_custkey,
        |  c_acctbal * 2.0 + CAST(c_custkey AS DOUBLE) AS prod_re,
        |  CAST(c_custkey AS DOUBLE) * 2.0 - c_acctbal AS prod_im,
        |  sqrt(c_acctbal * c_acctbal + CAST(c_custkey AS DOUBLE) * CAST(c_custkey AS DOUBLE)) AS modulus
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "t19_mixed_sac" ->
      s"""WITH m AS (SELECT CASE
         |  WHEN l_linenumber % 3 = 0 THEN CAST(l_extendedprice AS VARCHAR)
         |  WHEN l_linenumber % 3 = 1 THEN CAST(CAST(l_quantity AS INTEGER) AS VARCHAR)
         |  ELSE (CASE WHEN l_returnflag = 'R' THEN 'true' ELSE 'false' END) END AS raw
         | FROM lineitem),
         |c AS (SELECT
         |  CASE WHEN regexp_matches(raw, '^[+-]?[0-9]+$$') THEN 'int'
         |    WHEN regexp_matches(raw, '$floatReSql') THEN 'float'
         |    WHEN lower(raw) IN ('true','false') THEN 'bool'
         |    ELSE 'string' END AS subtype,
         |  CASE WHEN regexp_matches(TRIM(raw), '$floatReSql')
         |    THEN CAST(TRIM(raw) AS DOUBLE) END AS v
         | FROM m)
         |SELECT subtype, COUNT(*) AS n,
         |  CAST(SUM(CAST(v AS DECIMAL(12,2))) AS DOUBLE) AS total
         |FROM c GROUP BY subtype ORDER BY subtype""".stripMargin,
  )
}
