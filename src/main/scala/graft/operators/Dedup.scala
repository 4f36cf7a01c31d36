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
    * Built by zipping w shifted copies of the token array — interpreted
    * HOF lambdas re-evaluate any OUTER expression they reference per
    * element, so no lambda here touches anything but its own variables
    * (an element_at(split(...)) formulation re-tokenizes per shingle).
    * Documents shorter than `w` words get one partial shingle. */
  def shingleHashes(text: Column, w: Int = 3): Column = {
    val toks = split(normText(text), " ")
    // zip_with pads the shorter (shifted) side with null and concat_ws
    // skips nulls → the trailing w-1 entries are partial shingles,
    // trimmed by the final slice.
    val joined = (1 until w).foldLeft(toks) { (acc, k) =>
      zip_with(acc, slice(toks, lit(k + 1), greatest(size(toks) - k, lit(0))),
        (a, b) => concat_ws(" ", a, b))
    }
    val full = slice(joined, lit(1), greatest(size(toks) - (w - 1), lit(1)))
    // sorted: min-hash aggregation is order-independent, and the jaccard
    // verify join gets a codegen'd merge-scan intersection
    array_sort(array_distinct(transform(full, s => xxhash64(s))))
  }

  /** MinHash signature: `h` minima in one compiled loop (native
    * expression — see graft.expressions.MinHashSignature). */
  def minhashSignature(shingles: Column, h: Int = 64): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.MinHashSignature(
      ColumnBridge.expression(shingles), h))
  }

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
    // staged projections: sh → sig → bands, so each step reads the
    // previous as a row attribute (bandKeys over an inline signature
    // would re-run the signature aggregate once per band). persisted:
    // consumed three times below (band explode + both verify-join
    // sides). At cluster scale this is a checkpoint.
    val withSig = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), w).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), h))
      .withColumn("bands", bandKeys(col("sig"), h, bands))
      .persist()
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
      .withColumn("common", {
        import org.apache.spark.sql.graft.ColumnBridge
        ColumnBridge.column(graft.expressions.SortedLongArrayIntersectCount(
          ColumnBridge.expression(col("sh_a")),
          ColumnBridge.expression(col("sh_b")))).cast("double")
      })
      .withColumn("jaccard",
        col("common") / (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  // ---------------------------------------------------------------------
  // SimHash
  // ---------------------------------------------------------------------

  /** 64-bit SimHash of the token multiset: per bit, sign of the sum of
    * ±1 contributions from each token hash. The 64 bit-counters are
    * computed in a single native-expression pass. */
  def simhash(text: Column): Column =
    simhashFromTokHashes(transform(split(normText(text), " "), t => xxhash64(t)))

  /** SimHash from a token-hash array: one compiled loop (native
    * expression — see graft.expressions.SimHash64). */
  def simhashFromTokHashes(tokHashes: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.expressions.SimHash64(
      ColumnBridge.expression(tokHashes)))
  }

  /** Near-dup pairs with Hamming distance <= maxDist on 64-bit SimHash.
    * Pigeonhole bucketing: split the hash into (maxDist+1) chunks — any
    * pair within maxDist agrees on at least one chunk, so the self-join
    * runs per chunk bucket, never all-pairs. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bits = 64 / chunks
    // persisted: both sides of the chunk-bucket self-join read it
    val sh = df.select(col(idCol).as("id"),
        transform(split(normText(col(textCol)), " "), t => xxhash64(t)).as("th"))
      .select(col("id"), simhashFromTokHashes(col("th")).as("sh"))
      .persist()
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
    // grams as SORTED xxhash64 longs: 8-byte elements + sort-once so the
    // per-pair intersection is a codegen'd merge scan, not a hash set
    val grams = expr(s"array_sort(array_distinct(transform(sequence(1, greatest(length(nt) - ${n - 1}, 1)), i -> xxhash64(substr(nt, i, $n)))))")
    // persisted: both join sides consume the gram arrays
    val base = df.select(Seq(col(idCol).as("id"), normText(col(textCol)).as("nt")) ++
        blockCols.zipWithIndex.map { case (c, i) => c.as(s"blk$i") }: _*)
      .withColumn("grams", grams).drop("nt")
      .withColumn("ng", size(col("grams")).cast("double"))
      .persist()
    val keys = blockCols.indices.map(i => s"blk$i")
    val joined = base.as("a").join(base.as("b"),
      keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _) &&
        col("a.id") < col("b.id"))
    // |union| = |a| + |b| - |intersect|: one set operation per pair, not
    // two — and `common` is staged into its own projection so the
    // interpreted intersect isn't re-evaluated per reference (no CSE)
    import org.apache.spark.sql.graft.ColumnBridge
    val common = ColumnBridge.column(graft.expressions.SortedLongArrayIntersectCount(
      ColumnBridge.expression(col("a.grams")), ColumnBridge.expression(col("b.grams"))))
    joined.select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        common.cast("double").as("common"),
        (col("a.ng") + col("b.ng")).as("sz"))
      .select(col("id_a"), col("id_b"),
        (col("common") / (col("sz") - col("common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------------
  // Embedding cosine near-dup
  // ---------------------------------------------------------------------

  /** Pairs of embeddings with cosine >= threshold.
    *
    * PRODUCTION path (`bands > 0`, the default): banded sign-LSH
    * candidate generation — `bands` keys of `bits` hyperplane signs per
    * vector (one compiled pass, graft.expressions.SignLshBands), a
    * self-join per (band, key) bucket, then EXACT cosine verification
    * of the surviving candidates only. Never all-pairs: the shuffle
    * carries (band, key, id) triples, random pairs collide at
    * ~bands·2^-bits, and a true pair at cos ≥ 0.9 escapes all bands
    * with probability < 1e-8 at the defaults (exact verification means
    * false candidates cost only a dot product, never a wrong row).
    *
    * `bands = 0` forces the exact all-pairs quadratic path — the
    * verification twin for differential tests at small SF, NOT for
    * production data. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, bits: Int = 16, bands: Int = 32,
      dim: Int = 64): DataFrame = {
    // norms precomputed per vector (not per pair) and the relation
    // persisted across its consumers; the pair expression is then a
    // single dot + one division.
    val v = df.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nv", VectorOps.norm(col("v")))
    val nn = col("a.nv") * col("b.nv")
    val cosExpr = when(nn === 0.0, 0.0)
      .otherwise(VectorOps.dot(col("a.v"), col("b.v")) / nn)
    if (bands <= 0) {
      val cached = v.persist()
      cached.as("a").join(cached.as("b"), col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"), cosExpr.as("cos"))
        .filter(col("cos") >= threshold)
    } else {
      import org.apache.spark.sql.graft.ColumnBridge
      val bk = ColumnBridge.column(graft.expressions.SignLshBands(
        ColumnBridge.expression(col("v")), bits, bands, dim))
      // persisted: band explode + both verify-join sides consume it
      val withB = v.withColumn("bk", bk).persist()
      val exploded = withB.select(col("id"), posexplode(col("bk")).as(Seq("band", "key")))
      val cand = exploded.as("a")
        .join(exploded.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      val side = withB.select(col("id"), col("v"), col("nv"))
      cand
        .join(side.toDF("id_a", "va", "nva"), "id_a")
        .join(side.toDF("id_b", "vb", "nvb"), "id_b")
        .select(col("id_a"), col("id_b"),
          when(col("nva") * col("nvb") === 0.0, 0.0)
            .otherwise(VectorOps.dot(col("va"), col("vb")) /
              (col("nva") * col("nvb"))).as("cos"))
        .filter(col("cos") >= threshold)
    }
  }
}
