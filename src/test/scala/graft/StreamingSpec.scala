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
