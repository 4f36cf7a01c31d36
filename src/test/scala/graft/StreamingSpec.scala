package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  test("S1: streaming windowed agg matches its batch twin") {
    val stream = StreamingOps.readEventsStream(spark, sf)
    val q = StreamingOps.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("s1_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("s1_out")
      .orderBy("win_start", "event_type").collect()
    val want = StreamingOps.windowedCountsBatch(Tables.events(spark, sf))
      .orderBy("win_start", "event_type").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) == w.getTimestamp(0))
      assert(g.getString(1) == w.getString(1))
      assert(g.getLong(2) == w.getLong(2))
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-6)
    }
  }

  test("S3: stateful sessionization matches batch sessions (closed ones)") {
    val stream = StreamingOps.readEventsStream(spark, sf)
    val q = StreamingOps.sessionizeStream(spark, stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("s3_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("s3_out")
      .selectExpr("user_id", "start_s", "n_events", "dur_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // batch truth: all sessions except each user's LAST (still open in state)
    val batch = relational.Relational.q24Sessionize(spark, sf)
    batch.createOrReplaceTempView("b24")
    val want = spark.sql(
      """SELECT user_id, start_s, n_events, dur_s FROM b24
        |WHERE (user_id, session_id) NOT IN (
        |  SELECT user_id, MAX(session_id) FROM b24 GROUP BY user_id)
        |""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("S2: streaming dedup emits each event_id once") {
    val stream = StreamingOps.readEventsStream(spark, sf)
    val q = StreamingOps.streamingDedup(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("s2_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val n = spark.table("s2_out").count()
    val distinct = spark.table("s2_out").select("event_id").distinct().count()
    assert(n > 0 && n == distinct)
  }
}

class StreamStaticJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("S4: stream-static broadcast enrichment matches its batch twin") {
    val dim = Tables.t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    val stream = StreamingOps.readEventsStream(spark, sf)
    val q = StreamingOps.enrichedSegmentCounts(stream, dim)
      .writeStream.outputMode("complete")
      .format("memory").queryName("s4_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("s4_out")
      .orderBy("win_start", "c_mktsegment").collect()
    val want = StreamingOps.enrichedSegmentCountsBatch(Tables.events(spark, sf), dim)
      .orderBy("win_start", "c_mktsegment").collect()
    assert(got.length == want.length && got.length > 0)
    got.zip(want).foreach { case (g, w) =>
      assert(g.getTimestamp(0) == w.getTimestamp(0))
      assert(g.getString(1) == w.getString(1))
      assert(g.getLong(2) == w.getLong(2))
      assert(math.abs(g.getDouble(3) - w.getDouble(3)) < 1e-6)
    }
  }
}

class QuantileSketchSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("t-digest approx percentiles track the exact order statistics") {
    val li = Tables.t(spark, sf, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(approx_percentile(col("l_extendedprice"),
        array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(5000)).as("ap"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = relational.Relational.q32Quantiles(spark, sf)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    exact.foreach { case (flag, ex) =>
      approx(flag).zip(ex).foreach { case (a, e) =>
        assert(math.abs(a - e) / math.max(math.abs(e), 1.0) < 0.02,
          s"$flag: approx $a vs exact $e")
      }
    }
  }
}

class StreamStreamJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("S5: stream-stream interval join matches its batch twin") {
    val stream = StreamingOps.readEventsStream(spark, sf)
    val q = StreamingOps.conversionJoin(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("s5_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("s5_out")
      .select("user_id", "purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = StreamingOps.conversionJoinBatch(Tables.events(spark, sf))
      .select("user_id", "purchase_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty)
    assert(got == want)
  }
}

class StreamSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("S6: parquet sink + checkpoint is exactly-once across restarts") {
    val out = java.nio.file.Files.createTempDirectory("graft_s6_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_s6_chk").toString
    def runOnce(): Unit = {
      val q = StreamingOps.readEventsStream(spark, sf)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    runOnce()
    val expected = Tables.events(spark, sf).count()
    assert(spark.read.parquet(out).count() == expected)
    // second start from the same checkpoint: source exhausted, no
    // duplicate output — the exactly-once resume contract
    runOnce()
    assert(spark.read.parquet(out).count() == expected)
  }
}
