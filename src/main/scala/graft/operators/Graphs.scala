package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative graph traversal over edge DataFrames.
  *
  * Reference scope note: the reference library has no graph surface;
  * this is part of the large-scale-pipeline extension mandated by the
  * north star (lineage walks, link graphs, co-occurrence expansion).
  */
object Graphs {

  /** Hop-bounded breadth-first search: minimum hop distance from any
    * seed to every node reachable within `maxHops`.
    *
    * `edges` must have columns (src, dst) — directed; pass both
    * orientations for an undirected walk. `seeds` must have column
    * (node). Returns (node, dist: long), dist = 0 for seeds.
    *
    * Scale shape: with `broadcastFrontier` (the default) each round is
    * a map-side broadcast probe of the persisted edge table — the
    * edges NEVER shuffle, only the matched destinations do (one
    * distinct per round); first discovery is provably the minimum
    * distance, so there is no min-aggregation over the full closure.
    * The frontier and visited sets ride as broadcasts, which holds
    * while they fit on executors (node-id sets, not payloads); for
    * frontiers past broadcast scale pass `broadcastFrontier = false`
    * to fall back to shuffled equi-joins. The caller should persist
    * `edges` (probed once per round). Driver sequences the rounds; all
    * data movement is distributed — the connectedComponents idiom with
    * a bounded round count.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      broadcastFrontier: Boolean = true): DataFrame = {
    def bc(df: DataFrame): DataFrame =
      if (broadcastFrontier) broadcast(df) else df
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    val s0 = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).persist()
    cached += s0
    var visited: DataFrame = s0
    var frontier: DataFrame = s0
    for (d <- 1 to maxHops) {
      // edges stay put: the frontier probes them map-side
      val next = edges
        .join(bc(frontier.select(col("node").as("src"))), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(bc(visited.select("node")), Seq("node"), "left_anti")
        .withColumn("dist", lit(d).cast(LongType))
        .persist()
      next.count() // materialize so the next round probes a settled set
      cached += next
      visited = visited.union(next) // lazy union of persisted rounds
      frontier = next
    }
    val out = visited.cache()
    out.count() // materialize, then release the per-round caches
    cached.foreach(_.unpersist())
    out
  }

  /** Fixed-iteration PageRank (simplified: dangling mass not
    * redistributed, as in the classic Spark example) — returns
    * (node, rank) after `iters` rounds of
    * r'(v) = (1−d)/N + d·Σ_{u→v} r(u)/outdeg(u).
    *
    * Determinism contract: per-edge contributions are rounded to 9
    * decimals and summed as DECIMAL(28,9) — exact and order-free —
    * then the damping blend runs in doubles; every iteration is
    * therefore bit-replayable in SQL regardless of partitioning (the
    * x13/e5 convention). N and the per-iteration sequencing are driver
    * model-state (the k-means idiom).
    *
    * Scale shape: per iteration ONE key-shuffle (contributions grouped
    * by dst with map-side partials) + a left join of the node list;
    * edges and out-degrees persist across iterations; ranks
    * materialize per round so lineage stays O(1). */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    val e = edges.select(col("src"), col("dst")).persist()
    cached += e
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    cached += nodes
    val n = nodes.count()
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
    cached += outDeg
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("node"),
          round(col("rank") / col("deg"), 9).cast(DecimalType(28, 9)).as("c"))
        .groupBy("node").agg(sum(col("c")).as("sc"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) + lit(damping) *
            coalesce(col("sc").cast(DoubleType), lit(0.0))).as("rank"))
        .persist()
      ranks.count()
      cached += ranks
    }
    val out = ranks.select(col("node"), round(col("rank"), 9).as("rank"))
      .cache()
    out.count()
    cached.foreach(_.unpersist())
    out
  }
}
