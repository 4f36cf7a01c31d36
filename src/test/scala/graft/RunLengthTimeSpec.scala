package graft

import graft.functions.TimeFns
import graft.operators.RunLength
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RunLengthSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("encode/decode round-trips an ordered column") {
    val df = Seq((0L, "a"), (1L, "a"), (2L, "b"), (3L, "a"), (4L, "a"), (5L, "a"))
      .toDF("k", "v")
    val rle = RunLength.encode(df, "k", "v")
      .orderBy("start_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rle == Seq(("a", 0L, 2L), ("b", 2L, 1L), ("a", 3L, 3L)))
    val back = RunLength.decode(RunLength.encode(df, "k", "v"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)
  }

  test("encode handles non-zero-based keys and reports compression") {
    val df = Seq((10L, "x"), (11L, "x"), (12L, "x"), (13L, "y")).toDF("k", "v")
    val (n, runs, ratio) = RunLength.stats(df, "k", "v")
    assert(n == 4 && runs == 2 && ratio == 2.0)
  }

  test("runs merge across block boundaries (skewed fill value, many blocks)") {
    // 1000 keys, one dominant fill value with islands of 'hit' at every
    // 100th key; blockSize=64 forces runs to span many block boundaries
    val df = spark.range(0, 1000).toDF("k")
      .withColumn("v", when(col("k") % 100 === 0, "hit").otherwise("fill"))
    val rle = RunLength.encode(df, "k", "v", blockSize = 64)
    val runs = rle.orderBy("start_key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // expected: hit@0, fill 1..99, hit@100, ... => 20 runs total
    assert(runs.length == 20)
    assert(runs.head == ("hit", 0L, 1L))
    assert(runs(1) == ("fill", 1L, 99L))
    assert(runs.last == ("fill", 901L, 99L))
    // round-trip exactness
    val back = RunLength.decode(rle).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)
    // the dominant value's islands computation is partition-parallel:
    // the window spec carries the block column, never a global sort
    val plan = rle.queryExecution.executedPlan.toString
    assert(plan.contains("blk"), "expected block-partitioned window in plan")
  }

  test("whole-column single run still merges to one triple") {
    val df = spark.range(0, 500).toDF("k").withColumn("v", lit("only"))
    val runs = RunLength.encode(df, "k", "v", blockSize = 32).collect()
    assert(runs.length == 1)
    val r = runs.head
    assert((r.getString(0), r.getLong(1), r.getLong(2)) == ("only", 0L, 500L))
  }

  test("compressed-form compute equals dense semantics (fill-aware)") {
    // sparse-ish column: long fill runs of 0 with scattered values
    val dense = spark.range(0, 2000).toDF("k")
      .withColumn("v", when(col("k") % 37 === 0, col("k") % 7 + 1).otherwise(0L))
    val rle = RunLength.encode(dense, "k", "v", blockSize = 256)
    // map on O(runs), aggregates folded from (value, run_len)
    val got = RunLength.aggregatesFromRuns(
      RunLength.mapValues(rle, v => v * 3 - 1), lit(-1L)).head()
    val m = dense.withColumn("mv", col("v") * 3 - 1)
    val want = m.agg(count(lit(1)), sum("mv"), min("mv"), max("mv"),
      sum(when(col("mv") === -1L, 1L).otherwise(0L))).head()
    assert(got.getLong(0) == want.getLong(0)) // n
    assert(got.getLong(2) == want.getLong(1)) // sum_v
    assert(got.getLong(3) == want.getLong(2)) // min_v
    assert(got.getLong(4) == want.getLong(3)) // max_v
    assert(got.getLong(5) == want.getLong(4)) // n_fill
    assert(got.getLong(6) == got.getLong(0) - got.getLong(5)) // nnz
    // the compute really ran compressed: far fewer runs than rows
    assert(rle.count() < 200)
  }
}

class TimezoneSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("localize interprets wall time; toWallClock inverts it") {
    val df = Seq("2024-06-01 12:00:00").toDF("s")
      .select($"s".cast("timestamp").as("ts"))
    // noon in New York (EDT, UTC-4) == 16:00 UTC
    val utc = df.select(TimeFns.localize($"ts", "America/New_York").as("u"))
    assert(utc.select(date_format($"u", "yyyy-MM-dd HH:mm:ss")).as[String].head()
      == "2024-06-01 16:00:00")
    val back = utc.select(TimeFns.toWallClock($"u", "America/New_York").as("w"))
    assert(back.select(date_format($"w", "yyyy-MM-dd HH:mm:ss")).as[String].head()
      == "2024-06-01 12:00:00")
  }

  test("dst boundary: winter offset differs") {
    val df = Seq("2024-01-01 12:00:00").toDF("s")
      .select($"s".cast("timestamp").as("ts"))
    val utc = df.select(date_format(
      TimeFns.localize($"ts", "America/New_York"), "HH:mm").as("h")).as[String].head()
    assert(utc == "17:00") // EST is UTC-5
  }
}

/** Seeded randomized differential test for the block-local RLE: random
  * value sequences + adversarial block sizes vs a straightforward
  * in-memory reference encoder. Exercises runs that start/end exactly
  * on block edges, whole-block runs, blockSize=1, and null values. */
class RunLengthPropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def referenceRle(vals: Seq[Option[String]], startKey: Long): Seq[(Option[String], Long, Long)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Long, Long)]
    var i = 0
    while (i < vals.length) {
      var j = i
      while (j < vals.length && vals(j) == vals(i)) j += 1
      out += ((vals(i), startKey + i, (j - i).toLong))
      i = j
    }
    out.toSeq
  }

  test("random sequences match the reference encoder at hostile block sizes") {
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 6) {
      val n = 200 + rnd.nextInt(300)
      val alphabet = Seq(Some("a"), Some("b"), Some("fill"), None)
      // biased toward the fill value to create long skewed runs
      val vals = Seq.fill(n)(
        if (rnd.nextInt(10) < 6) Some("fill") else alphabet(rnd.nextInt(alphabet.size)))
      val startKey = rnd.nextInt(1000).toLong
      val blockSize = Seq(1L, 2L, 7L, 64L, 1000L)(trial % 5)
      val df = vals.zipWithIndex
        .map { case (v, i) => (startKey + i, v.orNull) }.toDF("k", "v")
      val got = RunLength.encode(df, "k", "v", blockSize)
        .orderBy("start_key").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSeq
      val want = referenceRle(vals, startKey)
      assert(got == want, s"trial $trial blockSize $blockSize start $startKey")
    }
  }
}
