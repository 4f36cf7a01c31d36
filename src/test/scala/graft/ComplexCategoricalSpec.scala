package graft

import graft.functions.ComplexOps._
import graft.operators.Categorical
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComplexOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("complex arithmetic: (1+2i)*(3-i), division roundtrip, conj/mod/arg") {
    val df = Seq((1.0, 2.0, 3.0, -1.0)).toDF("ar", "ai", "br", "bi")
      .select(complex($"ar", $"ai").as("a"), complex($"br", $"bi").as("b"))
    val r = df.select(
      mul($"a", $"b").as("m"),
      re(div(mul($"a", $"b"), $"b")).as("rr"),
      im(div(mul($"a", $"b"), $"b")).as("ri"),
      modulus($"a").as("mod"),
      im(conj($"a")).as("cj"),
      arg(complex(lit(0.0), lit(1.0))).as("argI")).head()
    val m = r.getStruct(0)
    assert(m.getDouble(0) == 5.0 && m.getDouble(1) == 5.0) // (1+2i)(3-i) = 5+5i
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12 && math.abs(r.getDouble(2) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(3) - math.sqrt(5)) < 1e-12)
    assert(r.getDouble(4) == -2.0)
    assert(math.abs(r.getDouble(5) - math.Pi / 2) < 1e-12)
  }
}

class CategoricalSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("fit/transform/inverse roundtrip on lineitem returnflag") {
    val li = Tables.t(spark, sf, "lineitem")
    val dict = Categorical.fit(li, "l_returnflag")
    val codes = dict.orderBy("code").collect().map(r => r.getString(0) -> r.getInt(1))
    assert(codes.map(_._2).toSeq == codes.indices.toSeq) // dense 0..n-1
    assert(codes.map(_._1).toSeq == codes.map(_._1).sorted.toSeq) // sorted order
    val enc = Categorical.transform(li, "l_returnflag", dict)
    assert(enc.schema("l_returnflag").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val back = Categorical.inverse(enc, "l_returnflag", dict)
    val orig = li.groupBy("l_returnflag").count().orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val rt = back.groupBy("l_returnflag").count().orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rt == orig)
  }
}
