package graft

import graft.sources.Bucketed
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  import TestSpark._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed join plan has no Exchange and matches the plain join") {
    val li = Tables.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    Bucketed.write(li, "li_bucketed", "l_orderkey", 8)
    Bucketed.write(ord, "ord_bucketed", "o_orderkey", 8)
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = Bucketed.join(spark, "li_bucketed", "ord_bucketed",
          "l_orderkey", "o_orderkey")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
        // bucket-sorted tables also satisfy the SMJ ordering: no
        // explicit Sort operator on either side
        assert(!plan.contains("+- Sort "), s"unexpected sort:\n$plan")
        val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
        assert(j.count() == expected)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }

  test("groupBy on the bucket key aggregates without a shuffle") {
    val li = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    Bucketed.write(li, "li_bucketed_agg", "l_orderkey", 8)
    try {
      withConf("spark.sql.adaptive.enabled" -> "false") {
        val agg = spark.table("li_bucketed_agg")
          .groupBy("l_orderkey").agg(sum("l_quantity").as("q"))
        val plan = agg.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
        assert(agg.count() ==
          li.groupBy("l_orderkey").agg(sum("l_quantity")).count())
      }
    } finally spark.sql("DROP TABLE IF EXISTS li_bucketed_agg")
  }
}

class PartitionedLayoutSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("partition-column predicates prune to matching directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val docs = Tables.t(spark, sf, "documents").select("doc_id", "n_chars", "source")
    sources.Bucketed.writePartitioned(docs, dir, "source")
    val q = spark.read.parquet(dir).filter(col("source") === "src3")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(source"),
      s"partition filter not pushed:\n$scan")
    // only the matching partition's rows are read, and values are right
    val expected = docs.filter(col("source") === "src3").count()
    assert(expected > 0 && q.count() == expected)
    // data files for other sources are in other directories: reading
    // the pruned path directly shows the layout
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(subdirs.exists(_.startsWith("source=")))
    assert(subdirs.size > 1)
  }
}
