package graft

import graft.sources.GraftReader
import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  test("csv reader infers int/float/bool/datetime/string columns") {
    val dir = Files.createTempDirectory("graft_csv")
    Files.writeString(dir.resolve("data.csv"),
      """id,price,active,when,name
        |1,1.5,true,2024-01-01,alpha
        |2,2.25,false,2024-02-03,beta
        |-3,0.5,yes,2024-03-04,gamma
        |""".stripMargin)
    val df = GraftReader.csv(spark, dir.toString)
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(types("id") == LongType)
    assert(types("price") == DoubleType)
    assert(types("active") == BooleanType)
    assert(types("when") == TimestampType)
    assert(types("name") == StringType)
    assert(df.count() == 3)
    assert(df.filter(org.apache.spark.sql.functions.col("active")).count() == 2)
  }

  test("csv reader coerces malformed values to null, keeps good rows") {
    val dir = Files.createTempDirectory("graft_csv2")
    // one malformed int in an otherwise-int column → column stays string
    // under strict all-rows inference; a numeric column with one null
    // marker still infers (nulls don't count against inference)
    Files.writeString(dir.resolve("data.csv"),
      """k,v
        |1,10
        |2,
        |3,30
        |""".stripMargin)
    val df = GraftReader.csv(spark, dir.toString)
    assert(df.schema("v").dataType == LongType)
    assert(df.filter("v is null").count() == 1)
  }

  test("json reader types primitheve leaves") {
    val dir = Files.createTempDirectory("graft_json")
    Files.writeString(dir.resolve("data.json"),
      """{"a": "1", "b": "x"}
        |{"a": "2", "b": "y"}
        |""".stripMargin)
    val df = GraftReader.json(spark, dir.toString)
    assert(df.schema("a").dataType == LongType)
    assert(df.schema("b").dataType == StringType)
  }

  test("parquet passthrough refines string columns only") {
    val df = GraftReader.parquet(spark, s"$sf/orders.parquet")
    // o_orderstatus stays string; physical types untouched
    assert(df.schema("o_orderkey").dataType == LongType)
    assert(df.schema("o_orderstatus").dataType == StringType)
  }

  test("corrupt-record modes: PERMISSIVE quarantines, DROPMALFORMED drops, FAILFAST throws") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_json_modes")
      .toString
    Seq("""{"a": 1}""", """{"a": 2""", """{"a": 3}""")
      .toDF("value").coalesce(1).write.mode("overwrite").text(dir)
    val schema = "a LONG, _corrupt_record STRING"
    // Spark disallows queries touching ONLY the corrupt column on raw
    // files — cache the parsed batch first (the documented idiom)
    val perm = spark.read.schema(schema).option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record").json(dir)
      .cache()
    assert(perm.count() == 3)
    assert(perm.filter($"_corrupt_record".isNotNull).count() == 1)
    // the quarantined row keeps the raw evidence
    assert(perm.filter($"_corrupt_record".isNotNull)
      .head().getString(1) == """{"a": 2""")
    val dropped = spark.read.schema("a LONG")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 2)
    val ff = intercept[org.apache.spark.SparkException] {
      spark.read.schema("a LONG").option("mode", "FAILFAST").json(dir)
        .collect()
    }
    // the malformed-record cause sits under a FAILED_READ_FILE wrapper
    val chain = Iterator.iterate(ff: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.toLowerCase.contains("malformed"), chain)
  }
}
