package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CDC MERGE / upsert application — the write-side complement of the
  * q43 snapshot diff. Re-expresses the reference-category "apply a
  * change feed to a table" operation (MERGE INTO) as pure joins.
  */
object Merge {

  /** Apply a compacted CDC batch to a snapshot.
    *
    * `batch` carries `keyCol`, `opCol` ∈ {"U","D","I"} and the
    * snapshot's payload columns (same names). Semantics: D removes the
    * key, U rewrites an EXISTING key's payload, I adds a MISSING key;
    * a U on a missing key or an I on a present key is a no-op (the
    * strict MERGE matched/not-matched split). One op per key per batch
    * (compacted feed) — with multiple ops the last-writer is
    * unspecified, as in SQL MERGE.
    *
    * Scale shape: the snapshot — the 100 TB side — NEVER shuffles: a
    * left-anti (deletes), a left join (updates) and a left-anti-driven
    * insert union, each against the broadcast batch. A full-outer
    * formulation would exchange both sides; Spark can't broadcast
    * full-outer. `withAction` appends the per-row verdict
    * (K kept / U updated / I inserted). */
  def applyCdc(snap: DataFrame, batch: DataFrame, keyCol: String,
      opCol: String = "op", withAction: Boolean = false): DataFrame = {
    val payload = snap.columns.filterNot(_ == keyCol).toSeq
    val renamed = payload.foldLeft(batch)((d, c) =>
      d.withColumnRenamed(c, "__b_" + c))
    val dels = renamed.filter(col(opCol) === "D").select(col(keyCol))
    val ups = renamed.filter(col(opCol) === "U").drop(opCol)
      .withColumn("__upd", lit(true))
    val ins = renamed.filter(col(opCol) === "I").drop(opCol)
    val kept = snap
      .join(broadcast(dels), Seq(keyCol), "left_anti")
      .join(broadcast(ups), Seq(keyCol), "left")
      .select((col(keyCol) +:
        payload.map(c => coalesce(col("__b_" + c), col(c)).as(c))) ++
        (if (withAction) Seq(when(col("__upd"), "U").otherwise("K").as("action"))
         else Nil): _*)
    val inserted = ins
      .join(snap.select(keyCol), Seq(keyCol), "left_anti")
      .select((col(keyCol) +: payload.map(c => col("__b_" + c).as(c))) ++
        (if (withAction) Seq(lit("I").as("action")) else Nil): _*)
    kept.union(inserted)
  }

  /** Incremental materialized-aggregate maintenance: fold a delta's
    * aggregate PARTIALS into a maintained per-key summary without ever
    * re-reading the history — the view-maintenance analog of
    * [[applyCdc]]. The state schema is the standard mergeable quartet
    * (cnt, sum_v, min_v, max_v); avg and friends derive at read time
    * (sum/cnt), which is exactly why non-mergeable forms (avg, median)
    * must not be stored. Scale shape: the delta aggregates map-side to
    * per-key partials first, so the merge shuffles delta-key-sized
    * input against the state — the 100 TB history is never touched. */
  def mergeAggState(state: DataFrame, deltaPartials: DataFrame,
      keyCols: Seq[String]): DataFrame =
    state.union(deltaPartials)
      .groupBy(keyCols.map(col): _*)
      .agg(sum("cnt").as("cnt"), sum("sum_v").as("sum_v"),
        min("min_v").as("min_v"), max("max_v").as("max_v"))

  /** The partials for [[mergeAggState]]: per-key (cnt, sum_v, min_v,
    * max_v) of `valCol` — run this on the delta (or once on the
    * initial history) before folding. */
  def aggPartials(df: DataFrame, keyCols: Seq[String],
      valCol: Column): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"), sum(valCol).as("sum_v"),
        min(valCol).as("min_v"), max(valCol).as("max_v"))

  /** Survivorship merge (MDM "golden record"): per key, each value
    * column independently keeps its LATEST NON-NULL value across the
    * versioned feed, ordered by (`orderCol`, `tieCol`) — a sparse
    * update at t₂ does not erase an attribute set at t₁ (the
    * difference from plain last-row-wins).
    *
    * One aggregation, one shuffle, map-side-combined: each column is
    * an arg-max over the struct (order-if-non-null, tie, value) —
    * null order fields sort below every real timestamp, so a
    * value-bearing row always beats a null one and ties break by
    * `tieCol`. No windows, no per-column self-joins. */
  def goldenRecord(feed: DataFrame, keyCols: Seq[String], orderCol: String,
      tieCol: String, valueCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_versions") +: valueCols.map(c =>
      max(struct(
        when(col(c).isNotNull, col(orderCol)).as("o"),
        when(col(c).isNotNull, col(tieCol)).as("tb"),
        col(c).as("v"))).getField("v").as(c))
    feed.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** pandas `a.combine_first(b)` — patch frame `a` with `b` cell-wise:
    * the result carries the UNION of keys and the UNION of columns,
    * and for every (key, column) cell `a`'s value wins unless it is
    * null/absent, in which case `b`'s fills in. The two-frame special
    * case of q57's survivorship merge (there: latest-non-null across a
    * version FEED; here: positional priority across exactly two
    * frames) and the cell-wise complement of q45's row-wise MERGE —
    * q45 replaces whole rows, this repairs individual holes, the
    * standard "overlay this correction file" verb.
    *
    * Columns present in only one side pass through (a missing column
    * is an all-null column, per pandas); key columns must match by
    * name. Column ORDER diverges from pandas on purpose: pandas
    * sorts the column union lexicographically, this keeps a's columns
    * in a's order followed by b-only columns (the spec pins this
    * order — stable, and the overlay reads in the base frame's
    * layout). Scale shape: ONE full-outer equi-join on the keys —
    * both sides shuffle once by key, every payload column rides that
    * exchange, no windows, no second pass. */
  def combineFirst(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame = {
    val aCols = a.columns.filterNot(keys.contains)
    val bCols = b.columns.filterNot(keys.contains)
    // the disambiguation prefixes must not collide with real columns —
    // an input already carrying a literal __a_x/__b_x would silently
    // corrupt the overlay, so refuse loudly instead
    val clash = (a.columns ++ b.columns)
      .filter(c => c.startsWith("__a_") || c.startsWith("__b_"))
    require(clash.isEmpty,
      s"combineFirst: reserved __a_/__b_ column prefix in input: ${clash.mkString(", ")}")
    val an = aCols.foldLeft(a)((d, c) => d.withColumnRenamed(c, s"__a_$c"))
    val bn = bCols.foldLeft(b)((d, c) => d.withColumnRenamed(c, s"__b_$c"))
    // USING-style join coalesces the key columns across sides
    val j = an.join(bn, keys, "full_outer")
    val out = (aCols ++ bCols.filterNot(aCols.contains)).map { c =>
      if (aCols.contains(c) && bCols.contains(c))
        coalesce(col(s"__a_$c"), col(s"__b_$c")).as(c)
      else if (aCols.contains(c)) col(s"__a_$c").as(c)
      else col(s"__b_$c").as(c)
    }
    j.select(keys.map(col) ++ out: _*)
  }
}
