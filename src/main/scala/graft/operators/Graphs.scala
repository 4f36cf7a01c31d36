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
    * Scale shape: each round shuffles only the CURRENT frontier
    * (equi-join on src, then anti-join on node against the visited
    * set) — the visited payload never re-shuffles, and first
    * discovery is provably the minimum distance, so there is no
    * min-aggregation over the full closure. The caller should persist
    * `edges` if it is expensive to recompute (it is scanned once per
    * round). Driver sequences the rounds; all data movement is
    * distributed — the connectedComponents idiom with a bounded
    * round count.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val cached = scala.collection.mutable.Buffer.empty[DataFrame]
    var visited = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L)).persist()
    cached += visited
    var frontier = visited
    for (d <- 1 to maxHops) {
      frontier = frontier.select(col("node").as("src"))
        .join(edges, Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(d).cast(LongType))
        .persist()
      cached += frontier
      visited = visited.union(frontier).persist()
      cached += visited
    }
    val out = visited.cache()
    out.count() // materialize, then release the per-round caches
    cached.foreach(_.unpersist())
    out
  }
}
