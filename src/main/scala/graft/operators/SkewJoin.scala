package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the standard 100 TB remedy when
  * AQE's skew splitting isn't available (e.g. the skewed side feeds a
  * co-partitioned downstream op) or a handful of hot keys dwarf the
  * rest.
  *
  * The skewed (large) side gets a random-but-deterministic salt in
  * [0, salt); the build (smaller) side is replicated `salt` times with
  * every salt value; the join key becomes (key, salt) so one hot key
  * spreads over `salt` tasks. Row multiplicity is unchanged — each
  * skewed row matches exactly its own salt replica. */
object SkewJoin {

  /** Inner equi-join of `big` (skewed) with `small` on `key`,
    * spreading each key across `salt` partitions. The salt is derived
    * from a hash of the whole big-side row (deterministic, no RNG —
    * reproducible across runs and retries). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    val bigS = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col).toIndexedSeq: _*)), lit(salt)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-`n` most frequent keys of `df` — the hot-key report used to
    * decide whether salting is worth the build-side replication. */
  def hotKeys(df: DataFrame, key: String, n: Int = 10): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n_rows"))
      .orderBy(desc("n_rows"), col(key)).limit(n)
}
