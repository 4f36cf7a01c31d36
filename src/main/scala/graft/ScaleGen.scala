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
  * Usage: runMain graft.ScaleGen <srcDir> <outDir> <k>
  * (sf0.3 = k 3 from sf0.1, sf1 = k 10). */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
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

    // one row per shard id, crossed into each table (tiny broadcast)
    val shards = spark.range(k).select(col("id").as("shard"))
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
    wr(rep(rd("lineitem")).select(shift("l_orderkey", oO),
      shift("l_partkey", oP), shift("l_suppkey", oS), col("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate")), "lineitem")
    // events via Tables.events: normalizes the generator's NANOS
    // timestamps to TimestampType so the scaled copy reads anywhere
    wr(rep(Tables.events(spark, src)).select(shift("event_id", oE),
      col("ts"), shift("user_id", oU), col("event_type"), col("value"),
      col("props")), "events")
    // shard 0 keeps the original text verbatim; shard i>0 suffixes
    // every token, growing the vocab and severing cross-shard shingles
    wr(rep(rd("documents")).select(shift("doc_id", oD),
      when(col("shard") === 0, col("text")).otherwise(
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1·"), col("shard").cast("string")))).as("text"),
      col("lang"), col("source"), col("n_chars")), "documents")
    wr(rep(rd("embeddings")).select(shift("vec_id", oV),
      expr("concat(slice(embedding, cast(shard % size(embedding) as int) + 1, " +
        "size(embedding)), slice(embedding, 1, cast(shard % size(embedding) as int)))")
        .as("embedding"), col("label")), "embeddings")

    println(s"[scalegen] wrote $out at k=$k from $src")
    spark.stop()
  }
}
