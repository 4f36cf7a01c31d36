package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document-deduplication operators for training-data pipelines.
  *
  * Scale posture (100 TB): every variant shuffles only fixed-size
  * digests/signatures, never the text. Exact dedup is a hash groupBy;
  * MinHash/SimHash shuffle (band-key, id) pairs; candidate verification
  * joins the text back only for the (rare) colliding pairs.
  */
object Dedup {

  /** Normalized text: lowercase, collapsed whitespace. */
  def normText(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  // ---------------------------------------------------------------------
  // Exact dedup
  // ---------------------------------------------------------------------

  /** Exact dedup on a content digest: one hash-partitioned groupBy;
    * keeps the minimum id per digest (deterministic winner). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(normText(col(textCol)), 256).as("digest"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------------
  // MinHash + LSH
  // ---------------------------------------------------------------------

  /** Word w-shingles of the normalized text, as xxhash64 values.
    * Documents shorter than `w` words hash their whole text. */
  def shingleHashes(text: Column, w: Int = 3): Column = {
    val toks = split(normText(text), " ")
    val shingles = transform(
      sequence(lit(0), greatest(size(toks) - w, lit(0))),
      i => xxhash64(concat_ws(" ", (0 until w).map(k => element_at(toks, i + k + 1)): _*)))
    array_distinct(shingles)
  }

  /** MinHash signature: `h` minimums in ONE pass over the shingle array
    * (vector accumulator — avoids h separate array traversals and keeps
    * the whole signature inside a single codegen'd expression). */
  def minhashSignature(shingles: Column, h: Int = 64): Column =
    aggregate(
      shingles,
      array_repeat(lit(Long.MaxValue), h),
      (acc, sh) => zip_with(acc, sequence(lit(0), lit(h - 1)),
        (m, i) => least(m, xxhash64(sh, i))))

  /** LSH band keys: signature split into `bands` bands of `h/bands`
    * rows; each band hashed to one bucket key. */
  def bandKeys(sig: Column, h: Int, bands: Int): Column = {
    val r = h / bands
    array((0 until bands).map(b => xxhash64(slice(sig, b * r + 1, r), lit(b))): _*)
  }

  /** Candidate near-duplicate pairs via MinHash LSH, verified with the
    * exact shingle-set Jaccard. Returns (id_a, id_b, jaccard) with
    * jaccard >= `threshold`.
    *
    * Shuffle profile: explode of (band, id) — `bands` rows of 16 bytes
    * per doc — then a self-join on the band bucket; text arrays are
    * joined back only for surviving candidate pairs. */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, h: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val withSig = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), w).as("sh"))
      .withColumn("bands", bandKeys(minhashSignature(col("sh"), h), h, bands))
    val exploded = withSig.select(col("id"), posexplode(col("bands")).as(Seq("band", "key")))
    val cand = exploded.as("a")
      .join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val sets = withSig.select(col("id"), col("sh"))
    cand
      .join(sets.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sets.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash of the token multiset: per bit, sign of the sum of
    * ±1 contributions from each token hash. The 64 bit-counters are
    * unrolled at plan-build time (Scala loop → 64 aggregate exprs);
    * round-2 candidate for a single custom TypedImperativeAggregate. */
  def simhash(text: Column): Column = {
    val tokHashes = transform(split(normText(text), " "), t => xxhash64(t))
    (0 until 64).map { i =>
      val cnt = aggregate(tokHashes, lit(0L),
        (acc, hh) => acc +
          when(shiftright(hh, i).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(cnt > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Near-dup pairs with Hamming distance <= maxDist on 64-bit SimHash.
    * Pigeonhole bucketing: split the hash into (maxDist+1) chunks — any
    * pair within maxDist agrees on at least one chunk, so the self-join
    * runs per chunk bucket, never all-pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bits = 64 / chunks
    val sh = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val chunked = sh.select(col("id"), col("sh"),
      posexplode(array((0 until chunks).map(i =>
        shiftright(col("sh"), i * bits)
          .bitwiseAND(lit((1L << bits) - 1))): _*)).as(Seq("chunk", "key")))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.key") === col("b.key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  // ---------------------------------------------------------------------
  // n-gram Jaccard (character level)
  // ---------------------------------------------------------------------

  /** Exact char-3-gram Jaccard for candidate pairs blocked on
    * (source, length bucket) — blocking bounds the pair count so the
    * join never goes quadratic in the corpus. */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[Column], n: Int = 3, threshold: Double = 0.4): DataFrame = {
    val grams = expr(s"array_distinct(transform(sequence(1, greatest(length(nt) - ${n - 1}, 1)), i -> substr(nt, i, $n)))")
    val base = df.select(Seq(col(idCol).as("id"), normText(col(textCol)).as("nt")) ++
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk$i") }: _*)
      .withColumn("grams", grams).drop("nt")
    val keys = blockCols.indices.map(i => s"blk$i")
    val joined = base.as("a").join(base.as("b"),
      keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        col("a.id") < col("b.id"))
    joined.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.grams"), col("b.grams"))).cast("double") /
          size(array_union(col("a.grams"), col("b.grams"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------------
  // Embedding cosine near-dup
  // ---------------------------------------------------------------------

  /** Pairs of embeddings with cosine >= threshold, blocked by sign-LSH
    * buckets (candidate generation) — the scale path never compares
    * all pairs; pass `lshBits = 0` to force exact all-pairs (small data
    * / verification). */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, lshBits: Int = 0): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val withB =
      if (lshBits <= 0) v.withColumn("bucket", lit(0L))
      else {
        val dim = 64 // embeddings table dimension
        v.withColumn("bucket", VectorOps.signBucket(col("v"),
          VectorOps.hyperplanes(lshBits, dim)))
      }
    withB.as("a").join(withB.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        VectorOps.cosine(col("a.v"), col("b.v")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
