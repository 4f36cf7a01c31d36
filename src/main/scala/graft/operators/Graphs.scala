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
}
