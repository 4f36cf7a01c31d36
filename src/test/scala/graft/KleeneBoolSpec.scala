package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** t56: the pandas-documented Kleene truth tables, all 9 cells per
  * operator, plus the skipna/strict reduction quartet on tiny groups
  * with known verdicts. */
class KleeneBoolSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val cells: Seq[(java.lang.Boolean, java.lang.Boolean)] = for {
    x <- Seq[java.lang.Boolean](true, false, null)
    y <- Seq[java.lang.Boolean](true, false, null)
  } yield (x, y)

  test("AND/OR/XOR match the pandas Kleene tables cell by cell") {
    val out = cells.toDF("a", "b")
      .select(col("a"), col("b"), (col("a") && col("b")).as("and"),
        (col("a") || col("b")).as("or"), (col("a") =!= col("b")).as("xor"))
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1))) ->
        (Option(r.get(2)), Option(r.get(3)), Option(r.get(4)))).toMap
    def T = Option(true); def F = Option(false); def N = Option.empty[Any]
    // pandas BooleanDtype docs: False&NA=False, True|NA=True, else NA
    assert(out((T, T)) == (T, T, F))
    assert(out((T, F)) == (F, T, T))
    assert(out((T, N)) == (N, T, N))
    assert(out((F, T)) == (F, T, T))
    assert(out((F, F)) == (F, F, F))
    assert(out((F, N)) == (F, N, N))
    assert(out((N, T)) == (N, T, N))
    assert(out((N, F)) == (F, N, N))
    assert(out((N, N)) == (N, N, N))
  }

  test("skipna and strict reductions decide each group correctly") {
    // g1: {T, NA}  → any T/T,  all: skipna T, strict NA
    // g2: {F, NA}  → any: skipna F, strict NA; all F/F
    // g3: {NA, NA} → any: skipna F (pandas all-NA), strict NA;
    //                all: skipna T, strict NA
    // g4: {T, F}   → no NA: any T, all F in both flavors
    val rows: Seq[(String, java.lang.Boolean)] = Seq(
      "g1" -> true, "g1" -> null, "g2" -> false, "g2" -> null,
      "g3" -> null, "g3" -> null, "g4" -> true, "g4" -> false)
    val nNull = count(when(col("a").isNull, 1))
    val out = rows.toDF("g", "a").groupBy("g").agg(
        coalesce(bool_or(col("a")), lit(false)).as("any_skipna"),
        coalesce(bool_and(col("a")), lit(true)).as("all_skipna"),
        when(coalesce(bool_or(col("a")), lit(false)), "true")
          .when(nNull > 0, "NA").otherwise("false").as("any_strict"),
        when(!coalesce(bool_and(col("a")), lit(true)), "false")
          .when(nNull > 0, "NA").otherwise("true").as("all_strict"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getString(3), r.getString(4)))
      .toMap
    assert(out("g1") == (true, true, "true", "NA"))
    assert(out("g2") == (false, false, "NA", "false"))
    assert(out("g3") == (false, true, "NA", "NA"))
    assert(out("g4") == (true, false, "true", "false"))
  }
}
