package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.functions.{col, unix_timestamp}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Checkpoint-RECOVERY proofs — the streaming specs show
  * fold-equals-batch for uninterrupted queries; these kill a stateful
  * query mid-feed and restart it from its checkpoint, asserting the
  * resumed run converges to the same answer as the uninterrupted one.
  *
  * Four state regimes are covered:
  *  - S38: OPERATOR-managed fold state (S13's MV quartet) — durable
  *    per-trigger snapshots + Spark offset checkpointing; the restart
  *    must restore the snapshot AND skip already-committed input (a
  *    restore failure double-counts nothing — it UNDER-counts, because
  *    the replayed source offset excludes consumed batches — so final
  *    equality is a real restoration proof, not a tautology).
  *  - S39: SPARK-managed state (stateful streaming aggregation in the
  *    state store) — the same kill/restart protocol over a native
  *    groupBy count, proving the harness's checkpoint usage recovers
  *    engine-held state too.
  *  - S42: BOUNDARY-BUFFER state (S35's autocorr: a ≤7-rows/user day
  *    tail AND a sums row) — the kill lands with seam lag-pairs still
  *    unpriced, so recovery must restore BOTH relations for the
  *    resumed fold to equal batch t65.
  *  - S43: native session_window MERGE state (S18's operator) — the
  *    kill lands with open sessions spanning the seam, so the restored
  *    state must merge pre- and post-kill events into ONE session for
  *    the emitted set to equal batch q51.
  *
  *  - S25: CORPUS-INDEX state (the S8/S25/S32 digest/fingerprint
  *    family) — the kill lands with seam duplicates crossing it: the
  *    original enters the index before the kill, its near-copy
  *    arrives only after the restart, so a restore failure would
  *    mis-report the copy as fresh (known_frac 0) rather than
  *    under-count — index survival is observable in the verdicts
  *    themselves, and the resumed run must equal the uninterrupted
  *    twin verdict-for-verdict at the same trigger boundaries.
  *
  * S38 and S42 also assert the snapshot PRUNE: after 3+ triggers at
  * most two `state_batch=` dirs survive (the newest and its
  * crash-replay anchor) — unbounded state-dir growth is a slow leak a
  * long-running production query would otherwise hit. */
class StreamingRecoverySpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  test("S38: MV maintenance killed mid-feed resumes from checkpoint and equals the uninterrupted run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rows = Tables.t(spark, sf, "orders")
      .select(col("o_custkey"), col("o_totalprice")).limit(600)
      .as[(Long, Double)].collect().toSeq
    val (first, second) = rows.splitAt(rows.length / 2)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def run(mem: MemoryStream[(Long, Double)], ckpt: String, st: String,
        out: Array[(Long, Long, Double, Double, Double)] => Unit) =
      StreamingOps.streamingIncrementalMv(
          mem.toDF().toDF("k", "v"), Seq("k"), Tables.dec(col("v")),
          trigger = Trigger.ProcessingTime(0L),
          stateDir = Some(st), checkpointDir = Some(ckpt)) { d =>
        out(d.select(col("k"), col("cnt"),
            col("sum_v").cast("double"), col("min_v").cast("double"),
            col("max_v").cast("double"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
            r.getDouble(3), r.getDouble(4))))
      }

    val (ckpt, st) = (tmpDir("ckpt"), tmpDir("state"))
    val mem = MemoryStream[(Long, Double)]
    @volatile var last: Array[(Long, Long, Double, Double, Double)] = Array.empty

    // phase 1: consume the first half, then KILL the query
    val q1 = run(mem, ckpt, st, last = _)
    mem.addData(first: _*)
    q1.processAllAvailable()
    q1.stop()
    val atKill = last.toSet
    assert(atKill.nonEmpty)

    // phase 2: more data arrives while the query is down; a NEW query
    // (fresh driver state) restarts from the same checkpoint/stateDir.
    // Two feed rounds so the snapshot ids reach >= 2 and the prune
    // path actually deletes (batchId-2 and older become unreachable)
    val (secondA, secondB) = second.splitAt(second.length / 2)
    mem.addData(secondA: _*)
    last = Array.empty
    val q2 = run(mem, ckpt, st, last = _)
    q2.processAllAvailable()
    mem.addData(secondB: _*)
    q2.processAllAvailable()
    q2.stop()

    // the snapshot PRUNE: recovery only ever reads the newest id and
    // its crash-replay anchor (id-1) — after 3+ triggers the stale
    // `state_batch=` dirs must actually be gone, not merely unread
    val snaps = new java.io.File(st).listFiles()
      .filter(_.getName.startsWith("state_batch="))
      .map(_.getName.stripPrefix("state_batch=").toLong).sorted
    assert(snaps.length <= 2 && snaps.max >= 2,
      s"expected <=2 surviving snapshots after 3+ triggers, got ${snaps.toSeq}")

    // ground truth: the uninterrupted batch aggregate over everything
    val batch = graft.operators.Merge.aggPartials(
        rows.toDF("k", "v"), Seq("k"), Tables.dec(col("v")))
      .select(col("k"), col("cnt"), col("sum_v").cast("double"),
        col("min_v").cast("double"), col("max_v").cast("double"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(last.nonEmpty && last.toSet == batch,
      s"resumed MV diverged from uninterrupted run (${last.length} vs ${batch.size})")
    // and the resumed run genuinely processed ONLY the second half:
    // restoring state while replaying all input would double-count,
    // so equality above + a moved state below pins both directions
    assert(last.toSet != atKill, "restart processed no new data")
  }

  test("S39: Spark state-store aggregation killed mid-feed resumes from checkpoint") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rows = (0 until 400).map(i => (s"k${i % 7}", i.toLong))
    val (first, second) = rows.splitAt(200)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ckpt = tmpDir("ckpt_native")
    val mem = MemoryStream[(String, Long)]
    @volatile var last: Map[String, (Long, Long)] = Map.empty

    def start() = mem.toDF().toDF("g", "x")
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.count(col("x")).as("n"),
        org.apache.spark.sql.functions.sum(col("x")).as("s"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val upd = b.collect()
          .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        last = last ++ upd // update mode emits changed keys only
        ()
      }
      .trigger(Trigger.ProcessingTime(0L))
      .start()

    val q1 = start()
    mem.addData(first: _*)
    q1.processAllAvailable()
    q1.stop()

    mem.addData(second: _*)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val want = rows.groupBy(_._1).view
      .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
    assert(last == want,
      s"state-store aggregation did not recover: $last vs $want")
  }

  test("S43: native session_window state killed mid-feed resumes and equals batch q51") {
    // The remaining Spark-managed state shape after S39's groupBy
    // count: session_window MERGE state — per-OPEN-session rows that
    // the engine must restore for a session SPANNING the kill to emit
    // as one merged row (a lost open session would emit two split
    // sessions or drop the pre-kill events entirely; a groupBy count
    // recovery proof says nothing about the merge path).
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value"))
      .orderBy("ts")
      .as[(Long, java.sql.Timestamp, Double)].collect().toSeq
    // kill INSIDE a session: find a same-user consecutive event pair
    // within the 30-min gap nearest the median time and cut between
    // them, so that session's open state must survive the restart
    val gapMs = 30L * 60000L
    val median = rows(rows.length / 2)._2.getTime
    val intra = rows.groupBy(_._1).values.flatMap { es =>
      es.map(_._2.getTime).sorted.sliding(2).collect {
        case Seq(a, b) if b - a <= gapMs && b > a => (a, b)
      }
    }.toSeq
    assert(intra.nonEmpty, "no multi-event session in the corpus")
    val (seamA, seamB) = intra.minBy(p => math.abs(p._1 - median))
    val cut = seamB // first keeps seamA, second starts at seamB
    val first = rows.filter(_._2.getTime < cut)
    val second = rows.filter(_._2.getTime >= cut)
    // non-vacuous: some user's session spans the kill (an event
    // within the gap on each side) — otherwise the merge-state
    // restore would be untested
    val lastBefore = first.groupBy(_._1).view
      .mapValues(_.map(_._2.getTime).max).toMap
    assert(second.exists(r => lastBefore.get(r._1)
        .exists(t => r._2.getTime - t <= gapMs && r._2.getTime > t)),
      "no session spans the kill seam")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val ckpt = tmpDir("ckpt_sw")
    val mem = MemoryStream[(Long, java.sql.Timestamp, Double)]
    // append mode emits each watermark-closed session exactly once
    // across both query incarnations (exactly-once via the
    // checkpoint); a Set absorbs an at-least-once foreachBatch retry
    @volatile var got = Set.empty[(Long, Long, Long, Long, Double)]
    def start() = StreamingOps.sessionWindowStream(
        mem.toDF().toDF("user_id", "ts", "value"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        got = got ++ b.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3), r.getDouble(4)))
        ()
      }
      .trigger(Trigger.ProcessingTime(0L))
      .start()

    val q1 = start()
    mem.addData(first: _*)
    q1.processAllAvailable()
    q1.stop() // KILL with every seam session still open in state

    mem.addData(second: _*)
    val q2 = start()
    q2.processAllAvailable()
    // sentinel far past the horizon: advances the watermark so every
    // real session closes and emits (its own session stays open)
    val sentinelTs = new java.sql.Timestamp(
      rows.map(_._2.getTime).max + 100L * 86400000L)
    mem.addData((999999999L, sentinelTs, 0.0))
    q2.processAllAvailable()
    q2.stop()

    val want = relational.Relational.q51SessionWindow(spark, sf)
      .select("user_id", "start_s", "end_s", "n_events", "total_value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(got.nonEmpty && got == want,
      s"resumed session_window diverged from batch q51: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("S42: autocorr boundary buffers killed mid-feed resume and equal batch t65") {
    // The riskiest state shape: TWO relations — the ≤7-rows/user day
    // tail (which prices the lag pairs CROSSING the kill seam) and the
    // per-user sum-of-products row. A restore failure is visible both
    // ways: lost sums under-count the first half, a lost tail breaks
    // exactly the seam pairs (day d before the kill, day d+lag after),
    // so final equality against batch t65 certifies both relations.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val rows = Tables.events(spark, sf)
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
        col("value"))
      .as[(Long, Long, Double)].collect().toSeq
    // day-closed, day-monotone feed (the op's arrival contract), cut
    // into thirds: kill after the first, restart across the last two
    // so the snapshot ids reach >= 2 and the prune path deletes
    val days = rows.map(r => Math.floorDiv(r._2, 86400L)).distinct.sorted
    val (cut1, cut2) = (days(days.length / 3), days(2 * days.length / 3))
    def day(r: (Long, Long, Double)) = Math.floorDiv(r._2, 86400L)
    val first = rows.filter(day(_) < cut1)
    val mid = rows.filter(r => day(r) >= cut1 && day(r) < cut2)
    val tail = rows.filter(day(_) >= cut2)
    // seam rows must actually cross the kill point, or the tail
    // restore would be untested
    val firstUsers = first.map(_._1).toSet
    assert(mid.exists(r => firstUsers(r._1)), "no users cross the kill seam")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    type Out = Array[(Long, Long, Long, Option[Double], Long, Option[Double])]
    def run(mem: MemoryStream[(Long, Long, Double)], ckpt: String,
        st: String, out: Out => Unit) =
      StreamingOps.streamingAutocorr(
          mem.toDF().toDF("user_id", "es", "value")
            .withColumn("ts", col("es").cast("timestamp")),
          trigger = Trigger.ProcessingTime(0L),
          stateDir = Some(st), checkpointDir = Some(ckpt)) { d =>
        out(d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4),
          if (r.isNullAt(5)) None else Some(r.getDouble(5)))))
      }

    val (ckpt, st) = (tmpDir("ckpt_ac"), tmpDir("state_ac"))
    val mem = MemoryStream[(Long, Long, Double)]
    @volatile var last: Out = Array.empty

    val q1 = run(mem, ckpt, st, last = _)
    mem.addData(first: _*)
    q1.processAllAvailable()
    q1.stop() // KILL with seam pairs still unpriced
    val atKill = last.toSet
    assert(atKill.nonEmpty)

    mem.addData(mid: _*)
    last = Array.empty
    val q2 = run(mem, ckpt, st, last = _)
    q2.processAllAvailable()
    mem.addData(tail: _*)
    q2.processAllAvailable()
    q2.stop()

    val batch = typesystem.TypeQueries.t65Autocorr(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))).toSet
    assert(last.nonEmpty && last.toSet == batch,
      s"resumed autocorr diverged from batch t65 (${last.length} vs ${batch.size})")
    assert(last.toSet != atKill, "restart processed no new data")
    // prune held here too: ids reached >= 2, older snapshots deleted
    val snaps = new java.io.File(st).listFiles()
      .filter(_.getName.startsWith("state_batch="))
      .map(_.getName.stripPrefix("state_batch=").toLong).sorted
    assert(snaps.length <= 2 && snaps.max >= 2,
      s"expected <=2 surviving snapshots, got ${snaps.toSeq}")
  }

  test("S25: digest index killed mid-crawl restores and flags seam duplicates") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val words = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet")
    def mash(seed: Long): String = {
      var x = seed
      (0 until 120).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        words(((x >>> 33) % words.length).toInt)
      }.mkString(" ")
    }
    val (s1, s2) = (mash(42L), mash(777L))
    val fresh = words.reverse.mkString(" ") * 6
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // the four trigger feeds, shared by the killed run and its
    // uninterrupted twin (verdicts depend on trigger boundaries —
    // same groups, same boundaries, same answers)
    val feeds = Seq(
      Seq(1L -> s1, 2L -> s2),
      Seq(3L -> (s1 + " zz qq")), // near-copy of 1, same side of kill
      // SEAM duplicate: original 2 indexed BEFORE the kill, the copy
      // arrives only after the restart — plus genuinely new content
      Seq(4L -> (s2 + " zz qq"), 5L -> fresh),
      Seq(6L -> fresh)) // dup of post-restart content: index still folds

    def collectRun(mem: MemoryStream[(Long, String)], ckpt: String,
        st: String, feed: Seq[Seq[(Long, String)]],
        out: Map[Long, (Long, Long, Double)] => Unit) = {
      val q = StreamingOps.streamingCdcDedup(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
          trigger = Trigger.ProcessingTime(0L),
          stateDir = Some(st), checkpointDir = Some(ckpt)) { d =>
        out(d.collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap)
      }
      feed.foreach { g => mem.addData(g: _*); q.processAllAvailable() }
      q
    }

    // killed run: triggers 0-1, KILL, then 2-3 on a fresh query
    val (ckpt, st) = (tmpDir("ckpt"), tmpDir("state"))
    val mem = MemoryStream[(Long, String)]
    var got = Map.empty[Long, (Long, Long, Double)]
    collectRun(mem, ckpt, st, feeds.take(2), got ++= _).stop()
    assert(got.keySet == Set(1L, 2L, 3L))
    collectRun(mem, ckpt, st, feeds.drop(2), got ++= _).stop()

    // the seam duplicate is flagged ⟺ the digest index survived the
    // kill (its original was only ever seen pre-kill); a lost index
    // would report known_frac 0 here — failure is OBSERVABLE, not an
    // under-count
    val (n4, k4, f4) = got(4L)
    assert(n4 >= 3 && k4 >= n4 - 1 && f4 > 0.5,
      s"seam duplicate missed after restart: $k4/$n4 known")
    assert(got(5L)._2 == 0L) // fresh content: nothing known
    val (n6, k6, _) = got(6L)
    assert(k6 == n6, "post-restart fold lost: exact copy not fully known")

    // uninterrupted twin at the same trigger boundaries must agree
    // verdict-for-verdict
    val mem2 = MemoryStream[(Long, String)]
    var twin = Map.empty[Long, (Long, Long, Double)]
    collectRun(mem2, tmpDir("ckpt2"), tmpDir("state2"), feeds,
      twin ++= _).stop()
    assert(got == twin,
      s"killed+resumed verdicts diverge from uninterrupted twin")

    // snapshot prune: 4 triggers → ids reach 3; only the newest and
    // its crash-replay anchor survive
    val snaps = new java.io.File(st).listFiles()
      .filter(_.getName.startsWith("state_batch="))
      .map(_.getName.stripPrefix("state_batch=").toLong).sorted
    assert(snaps.length <= 2 && snaps.max >= 3,
      s"expected <=2 surviving snapshots after 4 triggers, got ${snaps.toSeq}")
  }
}
