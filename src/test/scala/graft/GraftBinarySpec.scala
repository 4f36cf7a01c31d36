package graft

import java.nio.file.Files

import graft.sources.GraftBinary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftBinarySpec extends AnyFunSuite {
  import TestSpark._

  private val fmt = "graft.sources.GraftBinarySource"

  private def writeNation(): String = {
    val dir = Files.createTempDirectory("gbn").toFile.getAbsolutePath
    val nation = Tables.t(spark, sf, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    // one file per region → 5 files with disjoint n_regionkey stats
    GraftBinary.write(nation, dir, filesBy = "n_regionkey")
    dir
  }

  test("round-trip: schema inferred, every row and value survives") {
    val dir = writeNation()
    val back = spark.read.format(fmt).load(dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    val orig = Tables.t(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"),
        col("n_regionkey").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(back.collect().map(_.toSeq).toSet == orig)
  }

  test("column pruning: scan reads only the requested columns") {
    val dir = writeNation()
    val plan = spark.read.format(fmt).load(dir)
      .select("n_name").queryExecution.executedPlan.toString
    assert(plan.contains("pruned=n_name"), s"no pruning in:\n$plan")
  }

  test("distributed write: per-key files, patched stats, truncate semantics") {
    val dir = writeNation()
    // one file per distinct n_regionkey, named by the key
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gbn")).map(_.getName).sorted
    assert(files.toSeq ==
      (0 to 4).map(k => s"part-$k.gbn"), files.mkString(","))
    // no stray temp files after commit
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.contains("inprogress")))
    // header stats were patched in place: each file's n_regionkey
    // (min, max) collapses to its own key, which is what file-skip uses
    val back = spark.read.format(fmt).load(dir)
    GraftBinary.filesOpened.set(0)
    assert(back.filter(col("n_regionkey") === 3L).count() ==
      Tables.t(spark, sf, "nation").filter(col("n_regionkey") === 3).count())
    assert(GraftBinary.filesOpened.get() == 1)
    // overwrite truncates: rewriting a 2-region subset leaves 2 files
    val sub = Tables.t(spark, sf, "nation")
      .filter(col("n_regionkey") <= 1)
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
    GraftBinary.write(sub, dir, filesBy = "n_regionkey")
    val after = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gbn")).map(_.getName).sorted
    assert(after.toSeq == Seq("part-0.gbn", "part-1.gbn"))
    assert(spark.read.format(fmt).load(dir).count() == sub.count())
  }

  test("write without filesBy: one file per partition, round-trips") {
    val dir = Files.createTempDirectory("gbn").toFile.getAbsolutePath
    val nation = Tables.t(spark, sf, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"))
      .repartition(3)
    nation.write.format(fmt).option("path", dir).mode("overwrite").save()
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".gbn"))
    assert(files.length == 3, files.map(_.getName).mkString(","))
    val back = spark.read.format(fmt).load(dir)
    assert(back.collect().map(_.toSeq).toSet ==
      nation.collect().map(_.toSeq).toSet)
  }

  test("footer stats skip disjoint files; results stay exact") {
    val dir = writeNation()
    val back = spark.read.format(fmt).load(dir)
    GraftBinary.filesOpened.set(0)
    // n_regionkey = 2 → exactly one of the 5 per-region files matches
    val got = back.filter(col("n_regionkey") === 2L)
      .select("n_nationkey").collect().map(_.getLong(0)).toSet
    assert(GraftBinary.filesOpened.get() == 1,
      s"expected 1 file opened, got ${GraftBinary.filesOpened.get()}")
    val want = Tables.t(spark, sf, "nation")
      .filter(col("n_regionkey") === 2)
      .select(col("n_nationkey").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
    // a range filter beyond every max opens nothing
    GraftBinary.filesOpened.set(0)
    assert(back.filter(col("n_regionkey") > 99L).count() == 0)
    assert(GraftBinary.filesOpened.get() == 0)
  }
}
