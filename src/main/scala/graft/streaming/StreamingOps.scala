package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface: the events table consumed as an
  * unbounded stream (file source here; Kafka/queue in production — the
  * transform graph is source-agnostic).
  *
  * Scale posture: watermarks bound state; windowed aggregation state is
  * per (window × event_type); dedup state is bounded by the watermark
  * horizon. Both survive arbitrarily long streams. */
object StreamingOps {

  /** Release stream-lifetime caches when THIS query terminates: the
    * guard operators (S34/S40) persist a fixed pool index for the
    * stream's lifetime — without a termination hook the blocks outlive
    * `query.stop()` for the whole session, so repeated guard starts
    * accumulate pool caches. A self-removing StreamingQueryListener
    * keyed on the query's runId unpersists exactly once; the
    * registered-before-start / runId-learned-after-start seam is
    * closed by re-checking a terminated-id set under the listener's
    * lock (unpersist is idempotent, so the worst race is a no-op). */
  private def unpersistOnTermination(spark: SparkSession,
      cached: Seq[DataFrame])(start: => org.apache.spark.sql.streaming.StreamingQuery)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val listener = new StreamingQueryListener {
      @volatile private var target: Option[java.util.UUID] = None
      private val terminated = new java.util.HashSet[java.util.UUID]()
      def arm(runId: java.util.UUID): Unit = synchronized {
        if (terminated.contains(runId)) release() else target = Some(runId)
      }
      private def release(): Unit = {
        cached.foreach(_.unpersist(false))
        spark.streams.removeListener(this)
      }
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = synchronized {
        terminated.add(e.runId)
        if (target.contains(e.runId)) release()
      }
    }
    spark.streams.addListener(listener)
    val q = start
    listener.arm(q.runId)
    q
  }

  /** The events parquet schema as written by the generator (nanosecond
    * timestamps are read as raw longs — see Tables.events). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over an events directory, ts normalized.
    * The file's physical ts type differs across generator versions
    * (TIMESTAMP(NANOS) read as long vs plain TIMESTAMP(MICROS)) — probe
    * it with a batch schema read and adapt, mirroring `Tables.events`.
    * Integer `div`, not `/`: ns magnitudes exceed double's mantissa. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val phys = spark.read
      .option("pathGlobFilter", "events.parquet").parquet(dir).schema
    val raw = spark.readStream
      .schema(phys)
      .option("pathGlobFilter", "events.parquet") // file source needs a dir
      .parquet(dir)
    phys("ts").dataType match {
      case TimestampType => raw
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** S1: watermarked tumbling-window aggregation per event type. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** S18: q51's sessions through Spark's NATIVE session_window
    * aggregate IN A STREAM — the engine itself carries the merge as
    * per-OPEN-session state (closed sessions emit once the watermark
    * passes their end; state never grows with history), the
    * streaming-capable form q51's batch run promises and S3's
    * hand-rolled flatMapGroupsWithState mirrors. Projection identical
    * to batch q51, so emitted rows compare 1:1 with the batch twin
    * restricted to watermark-closed sessions. */
  def sessionWindowStream(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"),
        graft.Tables.dsum(graft.Tables.dec(col("value"))).as("total_value"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("start_s"),
        unix_timestamp(col("sw.end")).as("end_s"),
        col("n_events"), col("total_value"))

  /** S2: streaming exact dedup on event_id within the watermark horizon
    * (bounded state: ids older than the watermark are evicted). */
  def streamingDedup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** One raw event for stateful processing. */
  final case class SessEvent(user_id: Long, es: Long, event_id: Long)
  /** Per-user open-session state carried across triggers. */
  final case class OpenSession(start: Long, last: Long, n: Long)
  /** A closed (gap-terminated) session. */
  final case class ClosedSession(user_id: Long, start_s: Long, n_events: Long, dur_s: Long)

  /** S3: stateful gap-based sessionization with
    * `flatMapGroupsWithState` — closed sessions are emitted as soon as
    * a later event exceeds the gap; each user's trailing open session
    * stays in state (bounded: one OpenSession per active user) until a
    * later trigger closes it. */
  def sessionizeStream(spark: SparkSession, events: DataFrame,
      gapSec: Long = 1800): org.apache.spark.sql.Dataset[ClosedSession] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val ev = events
      .select(col("user_id"), unix_timestamp(col("ts")).as("es"), col("event_id"))
      .as[SessEvent]
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val sorted = it.toSeq.sortBy(e => (e.es, e.event_id))
          var cur = state.getOption
          val out = Seq.newBuilder[ClosedSession]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.es - s.last <= gapSec =>
                cur = Some(s.copy(last = e.es, n = s.n + 1))
              case Some(s) =>
                out += ClosedSession(uid, s.start, s.n, s.last - s.start)
                cur = Some(OpenSession(e.es, e.es, 1))
              case None =>
                cur = Some(OpenSession(e.es, e.es, 1))
            }
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** S4: stream-static enrichment join — the static dimension is
    * BROADCAST to every micro-batch task (no stream-stream state, no
    * watermark needed for the join itself); counts roll up per segment
    * window. The canonical "enrich events with a dimension table" shape
    * at any scale: only the aggregation keeps state. */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame,
      window_ : String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), window_), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("c_mktsegment"),
        col("n"), col("total_value"))

  /** S5: stream-stream interval join — each purchase joined to the same
    * user's views in the preceding hour (conversion attribution). Both
    * sides carry watermarks and the join condition bounds event-time
    * distance, so Spark evicts join state once the watermark passes:
    * state is O(events in the interval horizon), not O(stream). */
  def conversionJoin(events: DataFrame, intervalSql: String = "INTERVAL 1 HOUR",
      watermark: String = "2 hours"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", watermark)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", watermark)
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(intervalSql))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Batch twin of [[conversionJoin]]. */
  def conversionJoinBatch(events: DataFrame,
      intervalSql: String = "INTERVAL 1 HOUR"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr(intervalSql))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"),
        col("p_ts"), col("v_ts"))
  }

  /** Batch twin of [[enrichedSegmentCounts]]. */
  def enrichedSegmentCountsBatch(events: DataFrame, dim: DataFrame,
      window_ : String = "1 hour"): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), window_), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("c_mktsegment"),
        col("n"), col("total_value"))

  /** Batch twin of [[windowedCounts]] for equivalence checks. */
  def windowedCountsBatch(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events.groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** S7: streaming heavy hitters — the Misra-Gries summary as global
    * streaming state. Works BECAUSE the aggregate is mergeable: each
    * micro-batch's partials merge into the k-counter state exactly as
    * executor partials do in batch, so unbounded streams keep O(k)
    * state (complete output mode re-emits the current top-n per
    * trigger). Returns one row with the array<struct<item,cnt>>. */
  def streamingHeavyHitters(rows: DataFrame, itemCol: String,
      k: Int, n: Int): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    rows.agg(ColumnBridge.column(
      graft.expressions.FreqItemsAgg(
        ColumnBridge.expression(col(itemCol)), k, n)
        .toAggregateExpression()).as("hh"))
  }

  /** S8: continuous-crawl dedup — the streaming form of d9. Each
    * micro-batch of newly crawled documents is matched against the
    * stored corpus LSH index (plus itself, smaller-id-first) via
    * `foreachBatch` → [[graft.operators.Dedup.incrementalDedup]], and
    * the per-doc verdicts go to `sink`. The corpus side is the static
    * stored index; a production deployment appends each processed
    * batch's (band, key, id, shingles) rows to that store between
    * triggers so later crawls also dedup against earlier ones — the
    * operator itself is already index-shaped, the append is a plain
    * parquet write. foreachBatch (not a stream-static join) because the
    * verdict is a multi-stage job — explode, index join, exact verify,
    * per-doc aggregate — not a row-wise enrichment. */
  def streamingIncrementalDedup(docs: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.Dedup.incrementalDedup(
          corpus, b.toDF(), idCol, textCol))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** S34: streaming leakage guard — p7's live half. The held-out
    * (eval) set is FIXED at deployment; its LSH band index + shingle
    * sets are the only state — test-set-sized and CONSTANT forever,
    * the one index-matching twin whose state never grows even
    * logically (S8/S25/S32's indexes fold each batch in; this pool is
    * closed by definition, so there is nothing to fold). Every
    * arriving train-candidate doc is flagged BEFORE it enters the
    * training corpus if any held-out doc sits within Jaccard τ
    * ([[graft.operators.Dedup.leakageVerdicts]] per micro-batch) —
    * the live read: a re-crawl of a benchmark page, a paraphrased
    * eval question, flagged at ingest instead of surfacing as an
    * inflated eval score three weeks after the training run. No
    * intra-batch caveat: the leakage relation is train×test only, so
    * same-trigger train docs are correctly invisible to each other.
    * Per trigger: the batch explodes its own bands into one equi-join
    * against the fixed index + the exact verify on survivors —
    * batch-proportional work, never corpus-proportional. */
  def streamingLeakageGuard(docs: DataFrame, heldOut: DataFrame,
      idCol: String, textCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    // the closed-at-deployment index, shingled and cached ONCE for the
    // stream's lifetime — every trigger probes this same cache (the
    // docstring's "constant index" made literal; it was previously
    // rebuilt per micro-batch)
    val poolIdx = graft.operators.Dedup
      .leakageIndex(heldOut, idCol, textCol).persist()
    // pool cache released when the query terminates (the batchIdx
    // trigger-scoped cleanup's stream-lifetime counterpart)
    unpersistOnTermination(docs.sparkSession, Seq(poolIdx)) {
      docs.writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val batchIdx = graft.operators.Dedup
            .leakageIndex(b.toDF(), idCol, textCol).persist()
          try sink(graft.operators.Dedup
            .leakageVerdictsIndexed(poolIdx, batchIdx))
          finally batchIdx.unpersist() // trigger-scoped, like S32/S33/S35
        }
        .trigger(trigger)
        .start()
    }
  }

  /** S40: streaming exact-substring guard — d20's live half and S34's
    * positional sibling: each arriving doc is checked for MAXIMAL
    * exact token overlaps ≥ `minLen` against a FIXED reference pool
    * (the deployment corpus / eval set), via
    * [[graft.operators.Dedup.crossSubstringSpans]] over the pool's
    * positional-gram index, built and cached ONCE for the stream's
    * lifetime. Where S34 answers "is this doc a near-dup of the pool"
    * (set similarity), S40 answers "WHICH exact spans does it copy
    * and from where" — the contamination-span / quotation read.
    *
    * Emits one verdict row per batch doc per trigger: (id, n_spans,
    * max_span, n_copied_tokens) with zeros for clean docs —
    * n_copied_tokens is the UNION of the doc's span intervals
    * ([[graft.operators.Intervals.merge]], d21's device), so
    * overlapping matches from different pool partners never
    * double-count. Stateless across triggers (the pool is closed;
    * batches judge independently), so recovery is trivial — replayed
    * triggers recompute identical verdicts. */
  def streamingSubstringGuard(docs: DataFrame, pool: DataFrame,
      idCol: String, textCol: String, minLen: Int = 13,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val poolIdx = graft.operators.Dedup
      .positionalGrams(pool, idCol, textCol, minLen).persist()
    // pool cache released when the query terminates (mirrors S34)
    unpersistOnTermination(docs.sparkSession, Seq(poolIdx)) {
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batch = b.toDF()
        val batchIdx = graft.operators.Dedup
          .positionalGrams(batch, idCol, textCol, minLen).persist()
        try {
          val spans = graft.operators.Dedup
            .crossSubstringSpans(poolIdx, batchIdx, minLen)
          val merged = graft.operators.Intervals.merge(
            spans.select(col("id_b").as("id"), col("start_b").as("ss"),
              (col("start_b") + col("span_tokens")).as("ee"),
              lit(1L).as("n")),
            keyCol = "id")
          val perDoc = spans.groupBy(col("id_b").as("id"))
            .agg(count(lit(1)).as("n_spans"),
              max(col("span_tokens")).as("max_span"))
            .join(merged.groupBy("id")
              .agg(sum(col("m_end") - col("m_start"))
                .as("n_copied_tokens")), Seq("id"))
          sink(batch
            .select(col(idCol).cast("long").as("id"))
            .join(perDoc, Seq("id"), "left")
            .select(col("id"),
              coalesce(col("n_spans"), lit(0L)).as("n_spans"),
              coalesce(col("max_span"), lit(0L)).as("max_span"),
              coalesce(col("n_copied_tokens"), lit(0L))
                .as("n_copied_tokens")))
        } finally batchIdx.unpersist() // trigger-scoped, like S34
      }
      .trigger(trigger)
      .start()
    }
  }

  /** S35: streaming autocorrelation monitor — t65's live half. State
    * per user is the five exact Pearson sums per lag (DECIMAL(38,0),
    * additive) plus the last SEVEN (day, x) observations — the
    * boundary buffer that lets a new day pair with its lag-1/lag-7
    * partners across the trigger seam — so state is CONSTANT per key
    * forever (≤ 7 tail rows + 1 sums row), independent of stream
    * length. Each trigger: the batch's events collapse to daily
    * totals, the union tail∪batch computes lag pairs ONLY for rows
    * the batch contributed (old-tail pairs were counted when THEY
    * were new), the pair-sum increments fold into state by column
    * addition, and the corpus-so-far lag-1/lag-7 autocorrelation
    * re-derives through the SAME [[graft.operators.SeriesStats]]
    * kernel as batch t65 — so the fold equals the batch answer by
    * construction, doubles included. Arrival contract (the daily-
    * ingest shape): triggers are DAY-CLOSED and day-monotone per user
    * — a calendar day never spans two triggers; within a trigger any
    * order is fine (the daily groupBy is order-free). The live read:
    * a user's lag-1 autocorrelation collapsing mid-stream means the
    * daily pattern broke — a bot burst, a fee change, an
    * instrumentation bug — paged without re-reading history.
    *
    * `stateDir` + `checkpointDir` make the query KILLABLE exactly as
    * [[streamingIncrementalMv]]'s: both state relations (tails AND
    * sums) snapshot per trigger under one `state_batch=` dir, restore
    * picks the newest id < the replayed batch, stale snapshots prune
    * — StreamingRecoverySpec kills this query mid-feed with seam rows
    * crossing the kill point and proves the resumed fold equals the
    * uninterrupted batch answer. */
  def streamingAutocorr(rows: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      stateDir: Option[String] = None,
      checkpointDir: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val d38 = DecimalType(38, 0)
    val sumCols = Seq("n1", "sx1", "sy1", "sxy1", "sxx1", "syy1",
      "n7", "sx7", "sy7", "sxy7", "sxx7", "syy7")
    var tails: DataFrame = null
    var sums: DataFrame = null
    val writer = rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val bs = b.sparkSession
        // Checkpoint RECOVERY for the TWO-relation state shape (the
        // ≤7-rows/user boundary buffer + the per-user sums row) —
        // streamingIncrementalMv's protocol, one snapshot dir holding
        // both relations: restore the newest snapshot with id <
        // batchId (so the crash-replayed trigger re-derives from
        // id−1 and overwrites id idempotently); a partial snapshot is
        // never read because the write lands BEFORE the trigger's
        // offset commit.
        if (tails == null && sums == null) stateDir.foreach { dir =>
          val p = new org.apache.hadoop.fs.Path(dir)
          val fs = p.getFileSystem(bs.sparkContext.hadoopConfiguration)
          val committed =
            if (!fs.exists(p)) Array.empty[Long]
            else fs.listStatus(p).map(_.getPath.getName)
              .filter(_.startsWith("state_batch="))
              .map(_.stripPrefix("state_batch=").toLong)
              .filter(_ < batchId)
          if (committed.nonEmpty) {
            val base = s"$dir/state_batch=${committed.max}"
            tails = bs.read.parquet(s"$base/tails")
            sums = bs.read.parquet(s"$base/sums")
          }
        }
        val daily = b.toDF()
          .select(col("user_id"), to_date(col("ts")).as("day"),
            (col("value").cast(DecimalType(12, 2)) * lit(100))
              .cast(LongType).as("c"))
          .groupBy("user_id", "day").agg(sum(col("c")).as("x"))
        val u = (if (tails == null) daily.withColumn("is_new", lit(true))
          else tails.withColumn("is_new", lit(false))
            .unionByName(daily.withColumn("is_new", lit(true))))
          .persist()
        val w = Window.partitionBy("user_id").orderBy("day")
        def incSums(y: Column, p: String) = Seq(
          count(y).cast(LongType).as(s"n$p"),
          coalesce(sum(when(y.isNotNull, col("x")).cast(d38)),
            lit(0).cast(d38)).as(s"sx$p"),
          coalesce(sum(y.cast(d38)), lit(0).cast(d38)).as(s"sy$p"),
          coalesce(sum(col("x").cast(d38) * y.cast(d38)),
            lit(0).cast(d38)).as(s"sxy$p"),
          coalesce(sum(when(y.isNotNull,
            col("x").cast(d38) * col("x").cast(d38))),
            lit(0).cast(d38)).as(s"sxx$p"),
          coalesce(sum(y.cast(d38) * y.cast(d38)),
            lit(0).cast(d38)).as(s"syy$p"))
        val aggs = Seq(count(lit(1)).cast(LongType).as("n_days")) ++
          incSums(col("y1"), "1") ++ incSums(col("y7"), "7")
        val inc = u
          .withColumn("y1", lag("x", 1).over(w))
          .withColumn("y7", lag("x", 7).over(w))
          .filter(col("is_new"))
          .groupBy("user_id").agg(aggs.head, aggs.tail: _*)
        val folded = (if (sums == null) inc else {
          val old = sums
          old.as("a").join(inc.as("b"), Seq("user_id"), "full_outer")
            .select(col("user_id") +:
              (("n_days" +: sumCols).map { c =>
                (coalesce(col(s"a.$c"), lit(0).cast(d38)) +
                  coalesce(col(s"b.$c"), lit(0).cast(d38)))
                  .cast(if (c.startsWith("n")) LongType else d38).as(c)
              }): _*)
        }).persist()
        folded.count() // settle before releasing the parent state
        val newTails = u
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id").orderBy(col("day").desc)))
          .filter(col("rn") <= 7)
          .select("user_id", "day", "x")
          .persist()
        newTails.count()
        val (nextSums, nextTails) = stateDir match {
          case Some(dir) =>
            val base = s"$dir/state_batch=$batchId"
            folded.write.mode("overwrite").parquet(s"$base/sums")
            newTails.write.mode("overwrite").parquet(s"$base/tails")
            // prune: only batchId-1 is ever read again (the crash-
            // replay anchor) — older snapshots are unreachable
            val p = new org.apache.hadoop.fs.Path(dir)
            val fs = p.getFileSystem(bs.sparkContext.hadoopConfiguration)
            fs.listStatus(p).map(_.getPath)
              .filter(_.getName.startsWith("state_batch="))
              .filter(_.getName.stripPrefix("state_batch=").toLong < batchId - 1)
              .foreach(fs.delete(_, true))
            // RE-ROOT on the snapshot just written: after a restore,
            // folded/newTails carry lineage into the RESTORED
            // state_batch= dir, which a later trigger's prune deletes
            // — if a persisted block were then lost (executor death,
            // cache eviction past the disk tier), recomputation would
            // read a deleted path and throw. The fresh read's lineage
            // roots at the current snapshot, which the prune never
            // touches while it is newest-or-anchor.
            val rs = bs.read.parquet(s"$base/sums").persist()
            val rt = bs.read.parquet(s"$base/tails").persist()
            rs.count(); rt.count()
            folded.unpersist()
            newTails.unpersist()
            (rs, rt)
          case None => (folded, newTails)
        }
        if (sums != null) sums.unpersist()
        if (tails != null) tails.unpersist()
        u.unpersist()
        sums = nextSums
        tails = nextTails
        sink(sums.select(col("user_id"), col("n_days"),
          col("n1").as("n_lag1"),
          graft.operators.SeriesStats.pearson(col("n1"), col("sx1"),
            col("sy1"), col("sxy1"), col("sxx1"), col("syy1"))
            .as("autocorr_1"),
          col("n7").as("n_lag7"),
          graft.operators.SeriesStats.pearson(col("n7"), col("sx7"),
            col("sy7"), col("sxy7"), col("sxx7"), col("syy7"))
            .as("autocorr_7")))
      }
      .trigger(trigger)
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** S10: streaming CDC merge — a change feed applied to a maintained
    * snapshot, one [[graft.operators.Merge.applyCdc]] per micro-batch
    * (foreachBatch: the merge is a multi-join job, not a row-wise
    * enrichment). The updated snapshot goes to `sink` after every
    * trigger; batches apply strictly in trigger order (foreachBatch's
    * sequential contract), so the maintained state equals the batch
    * fold. Each new snapshot is materialized (persist + count) before
    * its parent is released — the incremental-state idiom S8/S9 use
    * for their indexes; a production deployment would write/read a
    * parquet (or Delta-style) table between triggers instead. */
  def streamingCdcMerge(ops: DataFrame, initial: DataFrame,
      keyCol: String, opCol: String = "op")(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var snap = initial.persist()
    snap.count()
    ops.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val next = graft.operators.Merge
          .applyCdc(snap, b.toDF(), keyCol, opCol).persist()
        next.count()
        snap.unpersist()
        snap = next
        sink(next)
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** S11: streaming crawl-frontier URL dedup — the streaming form of
    * d13. Each micro-batch canonicalizes arriving URLs
    * ([[graft.operators.Urls.canonicalize]] — the map-only codegen'd
    * expression), collapses the batch per canonical key (keep-min id),
    * and verdicts against the maintained frontier of already-seen
    * canonical keys (broadcast-friendly left join): `seen = true`
    * carries the stored `first_id`. Unseen keys fold into the frontier
    * between triggers (persist + count materialization before the
    * parent releases — the S8–S10 state idiom; a production frontier
    * is a parquet/Delta keyed store appended per trigger, and the
    * lookup a key-partitioned join). Verdict rows:
    * (canonical_url, id, n_in_batch, seen, first_id). */
  def streamingUrlFrontier(urls: DataFrame, initial: DataFrame,
      idCol: String, urlCol: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var frontier = initial
      .select(col("canonical_url"), col("first_id").cast("long").as("first_id"))
      .persist()
    frontier.count()
    urls.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batch = b.toDF()
          .select(col(idCol).cast("long").as("id"),
            graft.operators.Urls.canonicalize(col(urlCol)).as("canonical_url"))
          .groupBy("canonical_url")
          .agg(min(col("id")).as("id"), count(lit(1)).as("n_in_batch"))
        val verdict = batch.join(frontier, Seq("canonical_url"), "left")
          .select(col("canonical_url"), col("id"), col("n_in_batch"),
            col("first_id").isNotNull.as("seen"),
            coalesce(col("first_id"), col("id")).as("first_id"))
          .persist()
        verdict.count()
        val next = frontier.union(
          verdict.filter(!col("seen"))
            .select(col("canonical_url"), col("first_id"))).persist()
        next.count()
        frontier.unpersist()
        frontier = next
        sink(verdict)
        verdict.unpersist()
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** S12: streaming distribution-drift monitor — the streaming form of
    * x24. State is [[graft.operators.TextAnalysis.tokenCounts]]'s
    * (tok, c_a, c_b) table — vocabulary-sized and mergeable by plain
    * summation, so each micro-batch costs ONE token-explode aggregation
    * plus a vocab-sized union-groupBy fold; the drift terms
    * ([[graft.operators.TextAnalysis.driftFromCounts]]) are recomputed
    * from the folded state and emitted per trigger — the monitor always
    * reflects everything seen so far (equals the batch x24 over the
    * same prefix, which is what the spec asserts). State persists via
    * the S8–S11 persist+count idiom; production would checkpoint the
    * count table to a keyed store per trigger. */
  def streamingTokenDrift(docs: DataFrame, textCol: String,
      sliceA: Column,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var counts: Option[DataFrame] = None
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val bc = graft.operators.TextAnalysis
          .tokenCounts(b.toDF(), textCol, sliceA)
        val next = counts.map(_.union(bc)
            .groupBy("tok")
            .agg(sum("c_a").as("c_a"), sum("c_b").as("c_b")))
          .getOrElse(bc).persist()
        next.count()
        counts.foreach(_.unpersist())
        counts = Some(next)
        sink(graft.operators.TextAnalysis.driftFromCounts(next))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S13: streaming incremental materialized-view maintenance — the
    * streaming form of q55. Each micro-batch aggregates to per-key
    * partials ([[graft.operators.Merge.aggPartials]]) and folds into
    * the maintained summary ([[graft.operators.Merge.mergeAggState]])
    * — the mergeable-state quartet (cnt, sum, min, max), so state size
    * is key-cardinality, never history-sized, and each trigger costs
    * one map-side-combined aggregation + a key-sized fold. The folded
    * view goes to `sink` every trigger (equals the batch aggregate
    * over everything seen — the spec's assertion).
    *
    * `stateDir` + `checkpointDir` make the query KILLABLE: offsets
    * checkpoint through Spark's mechanism, the fold state snapshots
    * per trigger, and a restarted query resumes exactly where the
    * killed one stopped — StreamingRecoverySpec proves
    * resume-from-checkpoint equals the uninterrupted run. */
  def streamingIncrementalMv(rows: DataFrame, keyCols: Seq[String],
      valCol: Column,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      stateDir: Option[String] = None,
      checkpointDir: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    val writer = rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val bs = b.sparkSession
        if (state.isEmpty)
          stateDir.foreach(d => state = SnapshotState.restore(bs, d, batchId))
        val partials = graft.operators.Merge
          .aggPartials(b.toDF(), keyCols, valCol)
        val folded = state.map(st => graft.operators.Merge
            .mergeAggState(st, partials, keyCols))
          .getOrElse(partials).persist()
        folded.count()
        val next = stateDir match {
          case Some(dir) =>
            val re = SnapshotState.commit(bs, dir, batchId, folded)
            folded.unpersist()
            re
          case None => folded
        }
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next)
        ()
      }
      .trigger(trigger)
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** Durable snapshots for the driver-fold state idiom (S38's
    * machinery, shared by the index-state family): the fold state
    * normally lives in a driver var; with a stateDir each trigger
    * also snapshots it durably, keyed by batchId, and a restarted
    * query restores the newest snapshot with id < batchId.
    *
    * `< batchId` (not <=) is what makes the replayed trigger
    * idempotent: after a crash, Structured Streaming re-runs the last
    * uncommitted batch with the SAME id and data (checkpointed
    * offsets), and the fold re-derives from snapshot id−1 + that
    * batch, overwriting snapshot id with identical content. A partial
    * snapshot from a crash mid-write is never read, because the
    * snapshot write happens BEFORE the trigger's offset commit — an
    * incomplete snapshot id implies offset id never committed, so the
    * restart replays id and overwrites it. */
  private[streaming] object SnapshotState {
    /** Newest committed snapshot with id < batchId, if any. */
    def restore(bs: SparkSession, dir: String,
        batchId: Long): Option[DataFrame] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(bs.sparkContext.hadoopConfiguration)
      val committed =
        if (!fs.exists(p)) Array.empty[Long]
        else fs.listStatus(p).map(_.getPath.getName)
          .filter(_.startsWith("state_batch="))
          .map(_.stripPrefix("state_batch=").toLong)
          .filter(_ < batchId)
      if (committed.isEmpty) None
      else Some(bs.read.parquet(s"$dir/state_batch=${committed.max}"))
    }

    /** Write snapshot `batchId`, prune ids < batchId−1 (recovery only
      * ever reads the newest snapshot and its crash-replay anchor —
      * anything older is unreachable and would otherwise grow the
      * state dir without bound), and return the state RE-ROOTED on
      * the snapshot just written (persisted + counted): after a
      * restore, the folded state carries lineage into the RESTORED
      * state_batch= dir, which a later trigger's prune deletes — if a
      * persisted block were then lost, recomputation would read a
      * deleted path and throw. The caller unpersists the `folded` it
      * passed in. */
    def commit(bs: SparkSession, dir: String, batchId: Long,
        folded: DataFrame): DataFrame = {
      folded.write.mode("overwrite").parquet(s"$dir/state_batch=$batchId")
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(bs.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getPath)
        .filter(_.getName.startsWith("state_batch="))
        .filter(_.getName.stripPrefix("state_batch=").toLong < batchId - 1)
        .foreach(fs.delete(_, true))
      val re = bs.read.parquet(s"$dir/state_batch=$batchId").persist()
      re.count()
      re
    }
  }

  /** S14: streaming histogram quantiles — the streaming form of q60.
    * The grid ([lo, hi] × `buckets`) is pinned up front (production:
    * from historical data), so each micro-batch's cell counts
    * ([[graft.operators.Sketches.histCounts]]) fold into the
    * maintained histogram by PLAIN ADDITION — state is
    * cells-per-group sized, never history-sized — and the per-trigger
    * quantile read ([[graft.operators.Sketches.histQuantiles]]) runs
    * over that tiny state. The emitted estimates equal the batch
    * sketch over everything seen (the spec's assertion) because
    * histogram merge is exact, not approximate-on-merge. */
  def streamingHistQuantiles(rows: DataFrame, gCol: String, xCol: String,
      lo: Double, hi: Double, buckets: Int = 4096,
      qs: Seq[(Double, String)] = Seq(0.25 -> "p25", 0.5 -> "p50",
        0.75 -> "p75", 0.9 -> "p90"),
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cells = graft.operators.Sketches
          .histCounts(b.toDF(), gCol, xCol, lo, hi, buckets)
        val next = state.map(st =>
            st.union(cells).groupBy("g", "b").agg(sum("c").as("c")))
          .getOrElse(cells).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.Sketches.histQuantiles(next, lo, hi, buckets, qs))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S15: streaming Z-order layout audit — the streaming form of q62.
    * The dimension EXTENTS are pinned up front (production: a layout
    * contract fixes the z-grid so files stay mutually comparable as
    * the table grows), so each micro-batch's per-bucket stats fold
    * into maintained state by pure semigroup ops — counts ADD,
    * mins MIN, maxes MAX — state is bucket-count sized, never
    * history-sized. Emitted stats equal the batch audit over
    * everything seen (min/max/sum merges are exact). */
  def streamingZorderStats(rows: DataFrame, aCol: String, bCol: String,
      aMin: Long, aMax: Long, bMin: Long, bMax: Long, log2Buckets: Int = 6,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import graft.operators.ZOrder
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cells = b.toDF()
          .select(col(aCol).cast(LongType).as("da"),
            col(bCol).cast(LongType).as("db"))
          .select(col("da"), col("db"), ZOrder.zbucket2(
            ZOrder.normalize16(col("da"), lit(aMin), lit(aMax)),
            ZOrder.normalize16(col("db"), lit(bMin), lit(bMax)),
            log2Buckets).as("zb"))
          .groupBy("zb")
          .agg(count(lit(1)).as("n_rows"),
            min("da").as("a_min"), max("da").as("a_max"),
            min("db").as("b_min"), max("db").as("b_max"))
        val next = state.map(st => st.union(cells).groupBy("zb")
            .agg(sum("n_rows").as("n_rows"),
              min("a_min").as("a_min"), max("a_max").as("a_max"),
              min("b_min").as("b_min"), max("b_max").as("b_max")))
          .getOrElse(cells).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S16: streaming interval merge — the streaming form of q63.
    * Interval union is ASSOCIATIVE (merge(merge(A) ∪ B) ==
    * merge(A ∪ B)) and island event counts fold by addition, so the
    * maintained state is the merged islands THEMSELVES — one row per
    * merged interval regardless of how many events it absorbed, never
    * history-sized (a key streaming 24/7 contiguously holds ONE state
    * row). Each trigger re-sweeps state ∪ batch through
    * [[graft.operators.Intervals.merge]] (one key shuffle over
    * state+batch rows); the emitted islands equal the batch merge over
    * everything seen (the spec's assertion — the fold is exact, not
    * approximate-on-merge). Expects (user_id, ss, ee, n) rows. */
  def streamingIntervalMerge(rows: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val iv = b.toDF().select(col("user_id"), col("ss"), col("ee"),
          col("n"))
        val all = state.map(st => st.select(col("user_id"),
            col("m_start").as("ss"), col("m_end").as("ee"),
            col("n_events").as("n")).union(iv))
          .getOrElse(iv)
        val next = graft.operators.Intervals.merge(all, "user_id").persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S17: streaming per-group top-k — the streaming form of q44's
    * mergeable bounded-heap TopKAgg. The heap is a SEMIGROUP (merge of
    * two k-cuts = k-cut of the union, because any element outside both
    * k-cuts is beaten by ≥ k elements in its own cut alone), so the
    * maintained state is exactly one k-list per group, and each
    * trigger costs one map-side-combined TopKAgg over the batch plus a
    * (2k per group)-row re-cut of state ∪ partial — never
    * history-sized. The emitted leaderboard equals the batch top-k
    * over everything seen (the spec's assertion; ties break id asc
    * inside TopKAgg on both paths). Expects (g, score, id) rows. */
  def streamingTopK(rows: DataFrame, k: Int,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.graft.ColumnBridge
    def topk(df: DataFrame): DataFrame = {
      val tk = ColumnBridge.column(graft.expressions.TopKAgg(
        ColumnBridge.expression(col("score")),
        ColumnBridge.expression(col("id")), k).toAggregateExpression())
      df.groupBy("g").agg(tk.as("tk"))
        .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
        .select(col("g"), col("e.id").as("id"),
          col("e.score").as("score"), (col("pos") + 1).cast("int").as("rk"))
    }
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batchCut = b.toDF().select(col("g"), col("score"), col("id"))
        val all = state.map(st =>
            st.select(col("g"), col("score"), col("id")).union(batchCut))
          .getOrElse(batchCut)
        val next = topk(all).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S19: streaming OHLC bars — the streaming form of t53. An OHLC
    * bar is a SEMIGROUP: open/close are min/max-STRUCT selections on
    * the total (us, event_id) order, high/low are min/max, volume and
    * tick count are sums — every field merges exactly, so the
    * maintained state is ONE bar row per (user, day) regardless of how
    * many ticks it absorbed (never history-sized; a bar that stopped
    * trading stops costing anything). Each trigger = one
    * map-side-combined bar aggregation over the batch, folded into
    * state by the same min/max/add merges; emitted bars equal the
    * batch t53 over everything seen (the spec's assertion — the merge
    * is exact, not approximate). Volume is held as DECIMAL in state
    * (exact, order-free) and surfaced as double only in the read.
    * Expects (user_id, day_s, us, event_id, value) rows. */
  def streamingOhlc(rows: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    def bars(df: DataFrame): DataFrame = df
      .groupBy("user_id", "day_s")
      .agg(
        min(struct(col("us"), col("event_id"), col("value"))).as("o"),
        max(struct(col("us"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        sum(graft.Tables.dec(col("value")))
          .cast(DecimalType(38, 2)).as("vol"),
        count(lit(1)).as("n_ticks"))
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val partial = bars(b.toDF())
        val next = state.map(st => st.union(partial)
            .groupBy("user_id", "day_s")
            .agg(min("o").as("o"), max("c").as("c"),
              max("high").as("high"), min("low").as("low"),
              sum("vol").cast(DecimalType(38, 2)).as("vol"),
              sum("n_ticks").as("n_ticks")))
          .getOrElse(partial).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next.select(col("user_id"), col("day_s"),
          col("o.value").as("open"), col("high"), col("low"),
          col("c.value").as("close"),
          col("vol").cast(DoubleType).as("volume"), col("n_ticks")))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S20: streaming skyline — the streaming form of q65. Dominance is
    * MONOTONE under insertion (points are only added, so a dominated
    * point stays dominated forever) and the skyline operator is
    * distributive (skyline(A ∪ B) = skyline(skyline(A) ∪ B)), so the
    * maintained state is the CURRENT FRONTIER ITSELF — frontier-sized,
    * never history-sized — and each trigger re-runs the exact batch
    * operator over state ∪ batch. Multiplicities stay exact: a point
    * that ever reaches the final frontier was never dominated at any
    * earlier trigger, so its (n, rep) folded every occurrence (sum /
    * min merges on the dedup groupBy). Emitted frontier equals the
    * batch skyline over everything seen (the spec's assertion).
    * Expects (g, x, y, n, rep) rows — x minimized, y maximized. */
  def streamingSkyline(rows: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    def frontier(df: DataFrame): DataFrame =
      graft.operators.Skyline.skyline(
        df.groupBy("g", "x", "y")
          .agg(sum("n").as("n"), min("rep").as("rep")),
        "g", "x", "y", "n", "rep")
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batch = b.toDF().select("g", "x", "y", "n", "rep")
        val next = frontier(state.map(_.union(batch)).getOrElse(batch))
          .persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S21: streaming Count-Min sketch — the streaming form of x28. CMS
    * cells are purely ADDITIVE, so the maintained state is the fixed
    * seeds×buckets cell table whatever the stream length (4096 rows at
    * the x28 default — the canonical bounded-state frequency monitor),
    * and each trigger folds one map-side-combined batch cell count
    * into state by plain addition. The per-trigger read answers point
    * queries for a PINNED probe watchlist (production shape: the terms
    * an operator is monitoring — a data-dependent top-k would make the
    * probe set itself unstable across triggers); estimates carry CMS's
    * conservative guarantee and equal the batch sketch over everything
    * seen (the spec's assertion — addition is exact). Expects a `tok`
    * column. */
  def streamingCountMin(rows: DataFrame, probes: Seq[String],
      seeds: Int = 4, buckets: Int = 1024,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    def bucketOf(sd: Int, c: Column): Column =
      pmod(conv(substring(md5(concat(lit(sd + "|"), c)), 1, 15), 16, 10)
        .cast("long"), lit(buckets))
    def cellsOf(df: DataFrame): DataFrame = df
      .filter(col("tok") =!= "")
      .select(posexplode(array((0 until seeds).map(sd =>
        bucketOf(sd, col("tok"))): _*)).as(Seq("seed", "bucket")))
      .groupBy("seed", "bucket").agg(count(lit(1)).as("c"))
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cells = cellsOf(b.toDF())
        val next = state.map(st => st.union(cells).groupBy("seed", "bucket")
            .agg(sum("c").as("c")))
          .getOrElse(cells).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        val s = next.sparkSession
        import s.implicits._
        val pb = probes.toDF("tok")
          .select(col("tok"), posexplode(array((0 until seeds).map(sd =>
            bucketOf(sd, col("tok"))): _*)).as(Seq("seed", "bucket")))
        // an absent cell IS a zero count (the sketch has proven the
        // token unseen) — coalesce BEFORE the min, not after
        sink(pb.join(next, Seq("seed", "bucket"), "left")
          .groupBy("tok")
          .agg(min(coalesce(col("c"), lit(0L))).as("cms_n")))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S22: streaming event-transition matrix — the streaming form of
    * q67. Transition counts fold by ADDITION, so the count state is
    * the type²-sized matrix; the only other state is ONE carried
    * (us, event_id, type) max-struct per user — user-cardinality, the
    * boundary memory that stitches a batch's first event to the
    * previous batch's last. Each trigger: union the carried last
    * events (tagged) with the batch, one lag window, count only pairs
    * whose CURRENT row is a real batch row (carried rows contribute
    * only as predecessors — never double-counted), fold counts by
    * addition and re-fold the carried struct by max. Requires
    * per-user event-time-ordered arrival (the Kafka
    * partition-by-user shape); the spec splits by time and proves the
    * folded matrix equals the batch q67 counts over everything seen.
    * Expects (user_id, us, event_id, event_type) rows. */
  def streamingTransitions(rows: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    var counts: Option[DataFrame] = None
    var lastEv: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batch = b.toDF()
          .select(col("user_id"), col("us"), col("event_id"),
            col("event_type"), lit(false).as("carried"))
        val all = lastEv.map(le => le.select(col("user_id"), col("us"),
            col("event_id"), col("event_type"), lit(true).as("carried"))
            .union(batch))
          .getOrElse(batch)
        val w = Window.partitionBy("user_id").orderBy("us", "event_id")
        val pairs = all
          .withColumn("prev_type", lag("event_type", 1).over(w))
          .filter(!col("carried") && col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("cur_type"))
          .agg(count(lit(1)).as("n"))
        val nextCounts = counts.map(c => c.union(pairs)
            .groupBy("prev_type", "cur_type").agg(sum("n").as("n")))
          .getOrElse(pairs).persist()
        nextCounts.count()
        val nextLast = all
          .groupBy("user_id")
          .agg(max(struct(col("us"), col("event_id"), col("event_type")))
            .as("m"))
          .select(col("user_id"), col("m.us").as("us"),
            col("m.event_id").as("event_id"),
            col("m.event_type").as("event_type"))
          .persist()
        nextLast.count()
        counts.foreach(_.unpersist()); lastEv.foreach(_.unpersist())
        counts = Some(nextCounts); lastEv = Some(nextLast)
        sink(nextCounts
          .withColumn("tot", sum("n").over(Window.partitionBy("prev_type")))
          .select(col("prev_type"), col("cur_type"), col("n"),
            (col("n").cast("double") / col("tot").cast("double")).as("p")))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S23: streaming embedding diversity — the streaming twin of e13.
    * State = the per-label EXACT decimal moment rows (n, Σq_d, Σ‖q‖²)
    * of [[graft.operators.EmbedStats.diversityMoments]] — a true
    * semigroup (column-wise decimal addition: no rounding error, no
    * order sensitivity), so state stays label-cardinality sized and
    * the emitted diversity equals batch e13 over everything seen
    * EXACTLY, not approximately — the mode-collapse monitor a
    * continuously-embedded corpus runs per ingest batch. */
  def streamingDiversity(rows: DataFrame, labelCol: String, vecCol: String,
      dim: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cells = graft.operators.EmbedStats
          .diversityMoments(b.toDF(), labelCol, vecCol, dim)
        val next = state.map(st => graft.operators.EmbedStats
            .mergeMoments(st.unionByName(cells), dim))
          .getOrElse(cells).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.EmbedStats.diversityFromMoments(next, dim))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S24: streaming Good-Turing / OOV-mass monitor — the streaming
    * twin of x35. State = the (tok, c) vocabulary count table (the
    * S12 tokenCounts discipline: counts fold by ADDITION, vocab-sized
    * whatever the stream length); per trigger the batch's token counts
    * fold in and the emitted frequency-of-frequencies table — with
    * row 1's N_1/N unseen-mass estimate — equals batch x35 over
    * everything seen EXACTLY (integer counts + the same two divisions).
    * The live read: a crawl whose singleton mass stops falling has
    * stopped saturating — keep crawling; one whose N_1/N collapsed is
    * re-crawling itself. */
  def streamingGoodTuring(docs: DataFrame, textCol: String,
      maxR: Int = 10,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val cells = b.toDF()
          .select(explode(graft.operators.TextAnalysis
            .tokens(col(textCol))).as("tok"))
          .groupBy("tok").agg(count(lit(1)).as("c"))
        val next = state.map(st =>
            st.union(cells).groupBy("tok").agg(sum("c").as("c")))
          .getOrElse(cells).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.TextAnalysis.goodTuringFromCounts(next, maxR))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S25: streaming incremental CDC-chunk dedup — d17's streaming
    * half, in the S8 corpus-never-re-pairs posture: state = the seen
    * chunk-DIGEST index (digests only — text never re-chunks, never
    * re-shuffles); each arriving doc reports its chunk count and the
    * fraction already known to the corpus-so-far (a high known_frac is
    * a near-copy whose edits didn't disturb most content-defined
    * chunks — exactly what CDC boundaries exist to surface), then its
    * own digests fold into the index. State grows with DISTINCT corpus
    * chunks (the S8/d9 index posture, documented), not with stream
    * length times text size.
    *
    * Intra-batch blindness, pinned: "corpus-so-far" means the index AS
    * OF THE PREVIOUS trigger — docs in the SAME micro-batch never see
    * each other's digests (verdicts are computed against `state`
    * before the batch folds in), so an original and its near-copy
    * arriving in one trigger both report known_frac 0 and the copy is
    * flagged only from the NEXT batch on. Same-batch mutual dedup is
    * d17's batch job, not this operator's contract. */
  def streamingCdcDedup(docs: DataFrame, idCol: String, textCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      stateDir: Option[String] = None,
      checkpointDir: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    val writer = docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val bs = b.sparkSession
        // kill/restart recovery for the corpus digest index — the
        // [[SnapshotState]] idiom (snapshot per trigger, restore
        // newest < batchId, prune, re-root). Replay-safe BECAUSE the
        // restore predicate is strict: a crash-replayed trigger
        // re-judges its docs against snapshot id−1 — the index as of
        // the previous trigger, exactly the pinned intra-batch-
        // blindness contract — then overwrites snapshot id with
        // identical content.
        if (state.isEmpty)
          stateDir.foreach(d => state = SnapshotState.restore(bs, d, batchId))
        val chunks = graft.operators.Dedup
          .cdcChunks(b.toDF(), idCol, textCol).persist()
        chunks.count()
        val known = state match {
          case Some(idx) => chunks.join(idx, Seq("digest"), "left_semi")
            .groupBy("doc_id").agg(count(lit(1)).as("n_known"))
          case None => chunks.select(col("doc_id")).limit(0)
            .withColumn("n_known", lit(0L))
        }
        val verdicts = chunks.groupBy("doc_id")
          .agg(count(lit(1)).as("n_chunks"))
          .join(known, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_chunks"),
            coalesce(col("n_known"), lit(0L)).as("n_known"),
            round(coalesce(col("n_known"), lit(0L)) / col("n_chunks"), 6)
              .as("known_frac"))
        sink(verdicts)
        val folded = state.map(idx => idx.union(
            chunks.select("digest")).distinct())
          .getOrElse(chunks.select("digest").distinct()).persist()
        folded.count()
        val next = stateDir match {
          case Some(dir) =>
            val re = SnapshotState.commit(bs, dir, batchId, folded)
            folded.unpersist()
            re
          case None => folded
        }
        state.foreach(_.unpersist())
        state = Some(next)
        chunks.unpersist()
        ()
      }
      .trigger(trigger)
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }

  /** S28: streaming Bloom-filter dedup — d18's operational streaming
    * half, and the strongest bounded-state story in the family: state
    * is the SET BIT POSITIONS of an `mBits`-bit Bloom filter (≤ mBits
    * rows FOREVER — not corpus-sized, not vocab-sized; the d9/S8
    * digest index grows with the corpus, this never does). Each
    * arriving doc is flagged maybe-duplicate iff ALL its `kHash`
    * positions were set by a strictly-earlier doc — earlier triggers
    * via the folded bit set, earlier docs of the SAME trigger via the
    * batch-local min-setter (so for monotone id-ordered arrival the
    * verdicts equal [[graft.operators.Dedup.bloomVerdicts]]'s batch
    * min-setter replay doc-for-doc — the S28 spec proves it over a
    * 2-trigger split). Flags are maybe-dups with the filter's
    * false-positive rate (audited by the batch d18 twin); misses are
    * impossible (exact copies share every position).
    *
    * Per trigger: one explode to (id, pos), one pos-keyed min
    * aggregate, one join against the bounded bit set, one groupBy(id)
    * AND-fold. Text never shuffles; nothing in the trigger is
    * corpus-sized. */
  def streamingBloomDedup(docs: DataFrame, idCol: String,
      textCol: String, mBits: Int = 2048, kHash: Int = 3,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None // distinct set positions, ≤ mBits rows
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val d = b.toDF().select(col(idCol).cast("long").as("id"),
          md5(graft.operators.Dedup.normText(col(textCol))).as("digest"))
        val pos = d.select(col("id"),
          explode(graft.operators.Dedup.bloomPositions(col("digest"),
            mBits, kHash)).as("pos")).persist()
        pos.count()
        val batchMin = pos.groupBy("pos").agg(min("id").as("first_id"))
        val withPrev = state match {
          case Some(sb) => batchMin.join(
            sb.withColumn("prev", lit(true)), Seq("pos"), "left")
          case None => batchMin.withColumn("prev", lit(false))
        }
        // bit set before doc d ⟺ set in an earlier trigger OR the
        // batch's min setter < d (the d18 identity, batch-local)
        val verdicts = pos.join(withPrev, Seq("pos"))
          .withColumn("setb", coalesce(col("prev"), lit(false)) ||
            (col("first_id") < col("id")))
          .groupBy("id")
          .agg((min(col("setb").cast("int")) === 1).as("flagged"))
        sink(verdicts)
        val next = state.map(sb => sb.select("pos")
            .union(pos.select("pos")).distinct())
          .getOrElse(pos.select("pos").distinct()).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        pos.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S32: streaming partial-overlap detection via winnowing
    * fingerprints — x44's live half, and the GRANULARITY complement
    * of the family's other dedup streams: S28's Bloom flags whole-doc
    * exact copies, S25's CDC chunks catch shared kilobyte blocks,
    * while winnowing fingerprints ([[graft.operators.TextAnalysis.winnow]])
    * carry the SIGMOD'03 locality guarantee down to any shared
    * w+k−1-token run — a lifted quote, a boilerplate paragraph, a
    * partial plagiarism — robust to position shifts that break
    * fixed-width chunking. Each arriving doc reports
    * `n_known / n_fp`: the fraction of its selected fingerprints
    * already present in the corpus-so-far index.
    *
    * State = the DISTINCT fingerprint set — corpus-fingerprint
    * cardinality (expected density 2/(w+1) of corpus tokens, the
    * S8/S25 index posture, documented), never stream length × text;
    * history is never re-read and text never shuffles (fingerprints
    * fold within the row, only (id, fp) pairs move).
    *
    * Intra-batch blindness, pinned (the S25 contract): verdicts are
    * computed against the index AS OF THE PREVIOUS trigger, so an
    * original and its quoting doc arriving in one batch both report
    * known_frac 0. Docs below k+w−1 tokens select no fingerprints and
    * emit no verdict row (x44's pinned empty case). */
  def streamingWinnowOverlap(docs: DataFrame, idCol: String,
      textCol: String, k: Int = 4, w: Int = 5,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None // distinct fps, corpus-fp-cardinality
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val fps = graft.operators.TextAnalysis
          .winnow(b.toDF(), idCol, textCol, k, w)
          .select(col("id"), col("fp")).distinct().persist()
        fps.count()
        val known = state match {
          case Some(idx) => fps.join(idx, Seq("fp"), "left_semi")
            .groupBy("id").agg(count(lit(1)).as("n_known"))
          case None => fps.select(col("id")).limit(0)
            .withColumn("n_known", lit(0L))
        }
        val verdicts = fps.groupBy("id").agg(count(lit(1)).as("n_fp"))
          .join(known, Seq("id"), "left")
          .select(col("id").as("doc_id"), col("n_fp"),
            coalesce(col("n_known"), lit(0L)).as("n_known"),
            round(coalesce(col("n_known"), lit(0L)) / col("n_fp"), 6)
              .as("known_frac"))
        sink(verdicts)
        val next = state.map(idx => idx.union(fps.select("fp")).distinct())
          .getOrElse(fps.select("fp").distinct()).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        fps.unpersist()
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S33: streaming higher-moment monitor — t61's live half, and the
    * tightest state bound after S30: per key ONE row of five exact
    * integers (n, Σc, Σc², Σc³, Σc⁴ in cents — a semigroup under
    * column-wise addition), CONSTANT size per key forever, and every
    * trigger re-derives the corpus-so-far sample skewness G1 and
    * excess kurtosis G2 through the SAME [[graft.operators.Moments]]
    * kernels and pinned IEEE terminals as batch t61 — the fold is the
    * batch answer by construction, doubles included (the S30 "exact
    * decimal moment row" posture extended to 3rd/4th moments). The
    * live read: distribution shape drifting — a fee schedule change
    * skewing transaction values, a sensor saturating into negative
    * kurtosis — pages without re-reading history.
    *
    * Per trigger: one map pass + one key aggregate on the BATCH only,
    * a key-equi outer join against key-cardinality state. */
  def streamingMoments(rows: DataFrame, keyCol: String, valueCol: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val d38 = DecimalType(38, 0)
    val d19 = DecimalType(19, 0)
    var state: Option[DataFrame] = None // key, n, s1..s4 — one row per key
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val c = (b.toDF().select(col(keyCol).as("k"),
            (col(valueCol).cast(DecimalType(12, 2)) * lit(100))
              .cast(LongType).as("c")))
        val batch = c.groupBy("k").agg(
          count(lit(1)).as("n"),
          sum(col("c")).cast(d38).as("s1"),
          sum(col("c") * col("c")).cast(d38).as("s2"),
          sum((col("c") * col("c") * col("c")).cast(d38)).cast(d38).as("s3"),
          sum((col("c") * col("c")).cast(d19) *
            (col("c") * col("c")).cast(d19)).cast(d38).as("s4"))
        val folded = state match {
          case Some(st) =>
            batch.unionByName(st)
              .groupBy("k").agg(sum("n").as("n"),
                sum("s1").cast(d38).as("s1"), sum("s2").cast(d38).as("s2"),
                sum("s3").cast(d38).as("s3"), sum("s4").cast(d38).as("s4"))
          case None => batch
        }
        val next = folded.persist()
        next.count()
        val (m2i, m3i, m4i) = graft.operators.Moments.kernels(
          col("n"), col("s1"), col("s2"), col("s3"), col("s4"))
        sink(next
          .withColumn("m2i", m2i).withColumn("m3i", m3i)
          .withColumn("m4i", m4i)
          .select(col("k"), col("n"),
            graft.operators.Moments.g1(col("n"), col("m2i"), col("m3i"))
              .as("skew"),
            graft.operators.Moments.g2(col("n"), col("m2i"), col("m4i"))
              .as("kurt")))
        state.foreach(_.unpersist())
        state = Some(next)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S9: streaming ingest curation — each arriving micro-batch runs
    * the full curation pipeline (dedup, decontamination, quality,
    * length) INCREMENTALLY against the corpus's precomputed digest
    * index ([[graft.operators.Curation.curateIncremental]]): the
    * corpus's digests/grams/quality are computed ONCE here, never per
    * trigger, and per batch the index is consulted via a map-only
    * broadcast semi-join — the S8 "corpus never re-pairs" posture.
    * Only batch verdicts reach `sink`. A production deployment appends
    * kept batch digests to the index between triggers. */
  def streamingCuration(docs: DataFrame, corpus: DataFrame,
      evalDocs: DataFrame, idCol: String, textCol: String)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val corpusIndex = graft.operators.Curation
      .digests(corpus, idCol, textCol).persist()
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sink(graft.operators.Curation.curateIncremental(
          b.toDF(), corpusIndex, evalDocs, idCol, textCol))
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
  }

  /** S27: streaming Zipf rank-frequency monitor — x38's live half:
    * state = the (source, tok, c) count table (the S12/S24 tokenCounts
    * discipline — counts fold by ADDITION, vocab-sized whatever the
    * stream length; text tokenizes once in its arrival batch and never
    * re-shuffles), and each trigger re-derives the per-source
    * least-squares power-law fit via
    * [[graft.operators.TextAnalysis.zipfFromCounts]] — everything
    * after the fold is vocab-bounded (rank window + top-200 sums). The
    * live read: a crawl source whose slope drifts toward 0 is going
    * templated/boilerplate mid-crawl; one plunging far below −1 is
    * re-crawling the same pages (degenerate repetition) — caught per
    * ingest batch, not after the corpus is fixed. After any batch
    * prefix the emitted table provably equals batch x38 over
    * everything seen EXACTLY (integer count state + the identical
    * integer-micros regression; spec-pinned). */
  def streamingZipf(docs: DataFrame, textCol: String,
      sourceCol: String, topR: Int = 200,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val counts = b.toDF()
          .select(col(sourceCol).as("source"),
            explode(graft.operators.TextAnalysis.tokens(col(textCol)))
              .as("tok"))
          .filter(col("tok") =!= "")
          .groupBy("source", "tok").agg(count(lit(1)).as("c"))
        val next = state.map(st => st.union(counts)
            .groupBy("source", "tok").agg(sum("c").as("c")))
          .getOrElse(counts).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.TextAnalysis.zipfFromCounts(next, topR))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S29: streaming lexical-diversity monitor — x39's live half: each
    * arriving doc's moving-window distinct-type sums compute
    * WITHIN-ROW in its arrival batch (the x39 HOF kernel — text never
    * re-shuffles, never re-scans), fold into per-source integer
    * partials ([[graft.operators.TextAnalysis.mattrPartials]] — 4
    * additive int64 columns, SOURCE-cardinality state forever), and
    * each trigger re-derives the token-weighted window type ratio
    * Σ|distinct(win)| / Σ slots per source
    * ([[graft.operators.TextAnalysis.mattrMassFromPartials]]). The
    * live read: one source's ratio collapsing mid-crawl = boilerplate
    * flooding in. The ratio is ONE terminal IEEE division over exact
    * fold-order-free integer sums, so after any batch prefix the
    * emitted table equals the batch computation over everything seen
    * EXACTLY (spec-pinned, doubles included). */
  def streamingMattr(docs: DataFrame, textCol: String,
      sourceCol: String, w: Int = 25,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val partials = graft.operators.TextAnalysis
          .mattrPartials(b.toDF(), sourceCol, textCol, w)
        val next = state.map(st => st.union(partials)
            .groupBy("source").agg(
              sum("n_docs").as("n_docs"),
              sum("n_tokens").as("n_tokens"),
              sum("sum_win_types").as("sum_win_types"),
              sum("sum_win_slots").as("sum_win_slots")))
          .getOrElse(partials).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.TextAnalysis.mattrMassFromPartials(next))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S30: streaming anisotropy monitor — e20's live half and the
    * hardest-bounded state in the embedding family: state is ONE
    * exact decimal moment row of dim+2 numbers (n, Σ⌊norm·10⁶⌋,
    * per-dim Σ⌊û_d·10⁶⌋, Σ‖û‖²-on-grid) that folds by column-wise
    * addition — CONSTANT-size forever, independent of both stream
    * length and corpus cardinality (even the digest-index twins grow;
    * this never does). Each trigger re-derives mean pairwise cosine +
    * mean norm over everything seen, EXACTLY equal to batch e20 (the
    * grid sums are order-free integers), so a drifting embedder —
    * anisotropy creeping up as a fine-tune collapses directions —
    * pages before the next similarity job trusts its thresholds.
    * Vectors quantize in their arrival batch; nothing re-shuffles. */
  def streamingAnisotropy(rows: DataFrame, vecCol: String, dim: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val m = graft.operators.EmbedStats
          .anisotropyMoments(b.toDF(), vecCol, dim)
        val next = state.map(st => graft.operators.EmbedStats
            .mergeAnisotropyMoments(st.unionByName(m), dim))
          .getOrElse(m).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.EmbedStats.anisotropyFromMoments(next, dim))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S31: streaming cell-wise correction overlay — t60's live half
    * and the CELL-granular sibling of S10's row-wise CDC merge: a
    * stream of sparse correction records (each row fixes SOME columns
    * of one entity, nulls elsewhere) folds onto a keyed snapshot so
    * that every cell always holds its LATEST non-null value. Each
    * trigger first collapses the batch per key (q57's goldenRecord
    * argmax on `orderCol` — intra-batch corrections resolve by
    * version, not arrival race), then overlays it on the state via
    * `combineFirst(batch, state)` — batch cells win where non-null,
    * holes keep the prior value, new keys insert. State = the patched
    * snapshot: ENTITY-cardinality forever (the S10 posture), never
    * stream-length; for batches arriving in version order the state
    * provably equals batch q57 survivorship over everything seen
    * (spec-pinned). The live read: a corrections feed (manual fixes,
    * re-crawls, enrichment) kept continuously applied without ever
    * re-reading history. */
  def streamingCellOverlay(updates: DataFrame, keys: Seq[String],
      orderCol: String, valueCols: Seq[String],
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    updates.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val folded = graft.operators.Merge
          .goldenRecord(b.toDF(), keys, orderCol, orderCol, valueCols)
          .select((keys.map(col) ++ valueCols.map(col)): _*)
        val next = state.map(st => graft.operators.Merge
            .combineFirst(folded, st, keys))
          .getOrElse(folded).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(next)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S36: streaming snapshot diff — q43's live half and the LABEL
    * companion of S10's CDC merge / S31's cell overlay: a CDC stream
    * of (key, digest, op, seq) records folds onto a deployment
    * BASELINE snapshot, and every trigger re-emits the current
    * added/removed/changed labels vs that baseline — the "what has
    * drifted since the release snapshot" read, maintained live
    * instead of recomputed by a full q43 pass over two stored
    * snapshots. State = one row per key ever seen: (key, baseline
    * digest, current digest) — ENTITY-cardinality forever (the S10
    * posture), never stream-length — and the label is a pure
    * projection of that pair (base null → added, cur null → removed,
    * differing → changed), so transitions compose for free: a key
    * added then deleted nets to NO label, a change reverted to the
    * baseline digest nets to NO label — exactly q43's semantics
    * against the final state (spec-pinned). Each trigger: the batch
    * collapses per key to its LAST op by `seq` (the S31 argmax — no
    * arrival races), then ONE full-outer join folds it into state.
    * `baseline`/`cdc` columns: k, dg (+ op ∈ {U, D}, seq on cdc). */
  def streamingSnapshotDiff(cdc: DataFrame, baseline: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    val init = baseline.select(col("k"), col("dg").as("dg_base"),
      col("dg").as("dg_cur"))
    cdc.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val last = b.toDF().groupBy("k")
          .agg(max(struct(col("seq"), col("op"), col("dg"))).as("m"))
          .select(col("k"), col("m.op").as("op"), col("m.dg").as("dg_new"))
        val next = state.getOrElse(init)
          .join(last, Seq("k"), "full_outer")
          .select(col("k"), col("dg_base"),
            when(col("op").isNull, col("dg_cur"))
              .when(col("op") === "D", lit(null))
              .otherwise(col("dg_new")).as("dg_cur"))
          .persist()
        next.count()
        state.foreach(_.unpersist()) // init is never persisted; no-op there
        state = Some(next)
        sink(next.select(col("k"),
            when(col("dg_base").isNull && col("dg_cur").isNotNull, "added")
              .when(col("dg_base").isNotNull && col("dg_cur").isNull, "removed")
              .when(col("dg_base") =!= col("dg_cur"), "changed").as("change"))
          .filter(col("change").isNotNull))
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S37: streaming rolling quantile — t68's live half with S35's
    * boundary-buffer state design: per user the state is the last
    * THREE (es, event_id, value) observations — the buffer that lets
    * a new event see its three predecessors across the trigger seam —
    * so state is CONSTANT per key forever (≤ 3 tail rows),
    * independent of stream length. Each trigger: the union tail∪batch
    * runs ONE lag window per user, quantiles evaluate ONLY for rows
    * the batch contributed (old-tail rows were emitted when THEY were
    * new; a trailing frame over preceding rows means no event's
    * output is ever revised), and the new tail is the last 3 rows of
    * the union. The blends ride the SAME
    * [[graft.operators.SeriesStats.rollingQuantiles]] kernel as batch
    * t68, so the fold equals the batch pass by construction —
    * selection network, pinned IEEE blends, warm-up nulls included.
    * Arrival contract (S35's): triggers are event-time-monotone per
    * user; within a trigger any order is fine (the window sorts). The
    * live read: a user's rolling p50/p25 spread widening mid-stream
    * is a volatility page — without re-reading history. */
  def streamingRollingQuantile(rows: DataFrame,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    var tails: DataFrame = null
    rows.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val batch = b.toDF()
          .select(col("user_id"), unix_timestamp(col("ts")).as("es"),
            col("event_id"), col("value"))
        val u = (if (tails == null) batch.withColumn("is_new", lit(true))
          else tails.withColumn("is_new", lit(false))
            .unionByName(batch.withColumn("is_new", lit(true))))
          .persist()
        val w = Window.partitionBy("user_id").orderBy("es", "event_id")
        val (q25, q50, q75) = graft.operators.SeriesStats.rollingQuantiles(
          col("value"), col("l1"), col("l2"), col("l3"))
        sink(u
          .withColumn("l1", lag("value", 1).over(w))
          .withColumn("l2", lag("value", 2).over(w))
          .withColumn("l3", lag("value", 3).over(w))
          .filter(col("is_new"))
          .select(col("user_id"), col("es"), col("event_id"), col("value"),
            q25.as("roll_q25"), q50.as("roll_q50"), q75.as("roll_q75")))
        val newTails = u
          .withColumn("rn", row_number().over(Window.partitionBy("user_id")
            .orderBy(col("es").desc, col("event_id").desc)))
          .filter(col("rn") <= 3)
          .select("user_id", "es", "event_id", "value")
          .persist()
        newTails.count() // settle before releasing the parent state
        if (tails != null) tails.unpersist()
        u.unpersist()
        tails = newTails
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** S26: streaming mixing-plan monitor — p5's live half: as crawl
    * batches arrive, per-source available-token totals fold into state
    * (a semigroup sum — state is SOURCE-cardinality sized, never
    * stream-length sized; text tokenizes once in its arrival batch and
    * never re-shuffles) and each trigger re-derives the full
    * [[graft.operators.Sampling.mixingPlan]] allocation table, so the
    * mix operator watches T*, per-source epochs, and the BINDING
    * source shift live as availability grows. After any prefix of
    * batches the emitted table provably equals the batch solver over
    * everything seen (the S24 fold-then-finish posture; spec-pinned). */
  def streamingMixingPlan(docs: DataFrame, textCol: String,
      sourceCol: String, cap: Long = 4L,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var state: Option[DataFrame] = None
    docs.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val counts = b.toDF()
          .select(col(sourceCol).as("source"),
            size(graft.operators.TextAnalysis.tokens(col(textCol)))
              .cast("long").as("n_tokens"))
          .groupBy("source").agg(sum("n_tokens").as("avail"))
        val next = state.map(st => st.union(counts)
            .groupBy("source").agg(sum("avail").as("avail")))
          .getOrElse(counts).persist()
        next.count()
        state.foreach(_.unpersist())
        state = Some(next)
        sink(graft.operators.Sampling.mixingPlan(
          next.withColumn("u",
            regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 4 + 1),
          cap))
        ()
      }
      .trigger(trigger)
      .start()
  }
}
