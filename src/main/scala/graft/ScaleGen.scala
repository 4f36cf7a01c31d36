package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for the SCALING.md curve (dev tool, not part of
  * the library): replicates an SF directory k× into DISJOINT
  * key-shifted shards so every FK relationship, session structure and
  * within-shard duplicate topology is preserved while total volume
  * grows k×.
  *
  * Shard-disjointness matters for the measurement's honesty:
  * - keys (custkey/orderkey/partkey/suppkey/user_id/doc_id/vec_id)
  *   shift by shard × (max+1), so joins/groupings see k× keys, never
  *   artificial hot keys;
  * - document TOKENS are suffixed per shard (`tok` → `tok·i`), so the
  *   vocabulary grows k× (how a real corpus scales) and no cross-shard
  *   shingle/minhash/simhash candidates exist — replicating text
  *   verbatim would hand the dedup family C(k,2) fake pairs per doc
  *   and poison the exponent;
  * - embeddings circular-shift their dimensions per shard (norms and
  *   coordinate distribution preserved, cross-shard cosine ≈ random) —
  *   verbatim copies would make every vector a k-way exact duplicate;
  * - nation/region stay as-is (dimensions stay small at scale — the
  *   realistic shape) and FK columns into them are untouched.
  *
  * HUB MODE (4th arg `hub`): the SKEW axis the volume shards
  * deliberately exclude — hub mass grows WITH volume (the
  * preferential-attachment shape) while everything else stays the
  * disjoint-shard construction:
  * - lineitem: 10% of rows (deterministic xxhash64 pick) redirect
  *   l_partkey to a GLOBAL 32-part hot set that is NOT sharded — the
  *   co-purchase graph (q61/q77/q52/q59) grows 32 hub nodes whose
  *   degree scales linearly with k while the tail stays k-sharded;
  *   at k=10 each hub part sits in ~19k orders (vs tail ~30).
  * - events: an 80/20 hot-user factor — 20% of events reassign
  *   user_id to a global 16-user hot set (session/window partitions
  *   q24/q49/q51/q53 grow 16 straggler keys with k).
  * - documents: 10% of docs swap their text for a GLOBAL 30-token
  *   template prefix (not shard-suffixed) + their own last-24 tokens
  *   — shingle overlap ≈ 28/76 ≈ 0.37 Jaccard: BELOW the 0.5 threshold
  *   (true-pair sets stay ~fixed) but band-collision-hot, so the
  *   d2/d6/d19/p7 LSH band buckets and the verify join grow
  *   quadratically-candidate hot buckets with k — the exact stress
  *   Dedup.saltBuckets caps.
  *
  * DUP MODE (4th arg `dup`): the BIT-IDENTICAL-MASS axis — the regime
  * d22's identity pre-collapse exists for, deliberately absent from
  * both other modes (volume severs cross-shard duplicates; hub's
  * template docs keep unique tails, so they are near- but never
  * bit-identical). 10% of docs swap their text for ONE global
  * 54-token template verbatim (no shard suffix, no own tail), so the
  * identical-group size grows k× (500 → 5000 at k10 from sf0.1) and
  * the d20 pair report grows C(G,2)-quadratic (125k → 12.5M pairs)
  * while d22 folds the whole group to a single representative + an
  * n_pairs integer. Everything else stays the volume construction.
  *
  * LEN MODE (4th arg `len`): the DOCUMENT-LENGTH axis — per-doc token
  * count grows k× while every row count stays the source's (volume
  * constant, so the axis isolates per-row kernel cost from data
  * volume). Each doc's text becomes the original followed by k−1
  * token-suffixed copies of itself (`tok` → `tok·b` for block b) —
  * the same suffix device the volume shards use, so:
  * - the doc's token DISTRIBUTION is preserved (lang-id, quality,
  *   Zipf/entropy stats stay realistic at k× length);
  * - a doc's blocks never share tokens with its OTHER blocks or its
  *   original (distinct suffix per block), and cross-doc gram
  *   relations are exactly the source's, scaled: same-index blocks of
  *   two docs share `tok·b` precisely when the originals share `tok`,
  *   and no OTHER cross-doc relation exists — so near-dup topology
  *   (planted copies pair with planted copies, per block) replicates
  *   k× without any new spurious pair;
  * - within-doc repeat structure replicates per block — exactly how
  *   long real documents carry proportionally more internal repeats.
  * Stresses the per-token explode/HOF family (d20-family gram
  * indexes, winnowing, BPE, perplexity, chunking, CDC, MATTR) at k×
  * tokens per ROW — the regime where a per-doc collect or quadratic
  * window would blow up first.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <outDir> <k> [hub|dup|len]
  * (sf0.3 = k 3 from sf0.1, sf1 = k 10). */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
    val mode = if (args.length > 3) args(3) else ""
    require(mode.isEmpty || mode == "hub" || mode == "dup" || mode == "len",
      s"unknown mode '$mode' (expected 'hub', 'dup' or 'len')")
    val hub = mode == "hub"
    val dup = mode == "dup"
    val len = mode == "len"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scalegen")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rd(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def wr(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
    def off(name: String, key: String): Long =
      rd(name).agg(max(col(key))).head().getLong(0) + 1L

    // one row per shard id, crossed into each table (tiny broadcast);
    // len mode keeps ONE shard — volume constant, only text grows
    val shards = spark.range(if (len) 1 else k).select(col("id").as("shard"))
    def rep(df: DataFrame): DataFrame = df.crossJoin(broadcast(shards))

    val (oC, oO, oP, oS) = (off("customer", "c_custkey"),
      off("orders", "o_orderkey"), off("part", "p_partkey"),
      off("supplier", "s_suppkey"))
    val ev = Tables.events(spark, src)
    def offEv(key: String): Long =
      ev.agg(max(col(key))).head().getLong(0) + 1L
    val (oU, oE) = (offEv("user_id"), offEv("event_id"))
    val (oD, oV) = (off("documents", "doc_id"), off("embeddings", "vec_id"))

    def shift(c: String, o: Long) = (col(c) + col("shard") * o).as(c)

    wr(rd("nation"), "nation")
    wr(rd("region"), "region")
    wr(rep(rd("customer")).select(shift("c_custkey", oC), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")), "customer")
    wr(rep(rd("supplier")).select(shift("s_suppkey", oS), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")
    wr(rep(rd("part")).select(shift("p_partkey", oP), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"), col("p_retailprice")),
      "part")
    wr(rep(rd("orders")).select(shift("o_orderkey", oO),
      shift("o_custkey", oC), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"), col("o_orderpriority")), "orders")
    // hub mode: AFTER the shard shift, 10% of lineitem rows redirect
    // their partkey to the global hot-32 set (ids 1..32 live in every
    // shard-0 copy of part, so FKs stay valid); hub degree grows with
    // total volume, the preferential-attachment shape
    val liPk =
      if (!hub) shift("l_partkey", oP)
      else when(
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber"),
          col("shard")), lit(10L)) === 0L,
        pmod(xxhash64(col("l_partkey"), col("shard")), lit(32L)) + 1L)
        .otherwise(col("l_partkey") + col("shard") * oP).as("l_partkey")
    wr(rep(rd("lineitem")).select(shift("l_orderkey", oO),
      liPk, shift("l_suppkey", oS), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")), "lineitem")
    // events via Tables.events: normalizes the generator's NANOS
    // timestamps to TimestampType so the scaled copy reads anywhere
    // hub mode: 80/20 hot users — 20% of events land on a global
    // 16-user hot set, so per-user window/session partitions
    // (q24/q49/q51/q53) grow 16 straggler keys with volume
    val evUid =
      if (!hub) shift("user_id", oU)
      else when(
        pmod(xxhash64(col("event_id"), col("shard")), lit(5L)) === 0L,
        pmod(xxhash64(col("user_id"), col("shard")), lit(16L)) + 1L)
        .otherwise(col("user_id") + col("shard") * oU).as("user_id")
    wr(rep(Tables.events(spark, src)).select(shift("event_id", oE),
      col("ts"), evUid, col("event_type"), col("value"),
      col("props")), "events")
    // shard 0 keeps the original text verbatim; shard i>0 suffixes
    // every token, growing the vocab and severing cross-shard shingles
    val shardedText = when(col("shard") === 0, col("text")).otherwise(
      regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1·"), col("shard").cast("string"))))
    // hub mode: 10% of docs swap to a GLOBAL 30-token template prefix
    // + their own last-24 tokens — pairwise Jaccard ≈ 28/76 ≈ 0.37,
    // safely under the 0.5 threshold (no quadratic true-pair output),
    // but band-collision-hot: the LSH bucket for template-dominated
    // bands grows linearly with k, the saltBuckets stress. Docs
    // shorter than 24 tokens stay untouched (a shorter own-suffix
    // would push J over threshold).
    val tmpl = (0 until 30).map(i => s"hubtok$i").mkString(" ")
    // dup mode: the same 10% of docs become ONE bit-identical global
    // template (54 distinct tokens — no internal periodicity, so the
    // group's only self-match is the diagonal-0 full-document span)
    val dupTmpl = (0 until 54).map(i => s"duptok$i").mkString(" ")
    val docText =
      if (len)
        // original + (k−1) block-suffixed copies of itself: k× tokens,
        // preserved distribution; cross-doc grams are scaled copies of
        // the source's (same-index blocks collide iff the originals
        // do), never new relations
        // (blank docs stay verbatim — concat_ws would inject spaces)
        when(trim(col("text")) === "", col("text")).otherwise(
          concat_ws(" ", (col("text") +: (1 until k).map(b =>
            regexp_replace(col("text"), "(\\S+)", s"$$1·$b"))): _*))
      else if (hub) {
        val ts = split(trim(regexp_replace(lower(shardedText), "\\s+", " ")), " ")
        when(pmod(col("doc_id"), lit(10L)) === 7L && size(ts) >= 24,
          concat(lit(tmpl + " "), array_join(slice(ts, -24, 24), " ")))
          .otherwise(shardedText)
      } else if (dup)
        when(pmod(col("doc_id"), lit(10L)) === 7L, lit(dupTmpl))
          .otherwise(shardedText)
      else shardedText
    // n_chars = length(text) in the source corpus; recompute it on
    // the FINAL text so the metadata stays consistent with what the
    // shard actually holds (token suffixing, hub templates and dup
    // templates all change the length — carrying the original value
    // through would feed metadata-dependent queries contradictory
    // columns)
    wr(rep(rd("documents")).select(shift("doc_id", oD),
      docText.as("text"),
      col("lang"), col("source"),
      length(docText).cast("long").as("n_chars")), "documents")
    wr(rep(rd("embeddings")).select(shift("vec_id", oV),
      expr("concat(slice(embedding, cast(shard % size(embedding) as int) + 1, " +
        "size(embedding)), slice(embedding, 1, cast(shard % size(embedding) as int)))")
        .as("embedding"), col("label")), "embeddings")

    println(s"[scalegen] wrote $out at k=$k from $src")
    spark.stop()
  }
}
