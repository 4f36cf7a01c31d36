package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Dev scratch: phase-level timing of the q61/q77 triangle pipeline so
  * optimization targets the stage that actually costs (guide §1). Not
  * part of the library. */
object GraphBisect {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("graft-graphbisect")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bisect] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val t = graft.relational.Relational
    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val edges = li.as("a").join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("src"), col("b.pk").as("dst"))
      time("edges (pairs, no distinct)")(noop(edges))
      val und = edges
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .filter(col("a") =!= col("b")).distinct().persist()
      time("und distinct+persist")(und.count())
      println(s"  und rows: ${und.count()}, partitions: ${und.rdd.getNumPartitions}")
      val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      time("deg agg")(noop(deg))
      val oriented = und
        .join(broadcast(deg.select(col("node").as("a"), col("deg").as("da"))), Seq("a"))
        .join(broadcast(deg.select(col("node").as("b"), col("deg").as("db"))), Seq("b"))
        .select(
          when(col("da") < col("db") ||
              (col("da") === col("db") && col("a") < col("b")),
            struct(col("a").as("u"), col("b").as("v")))
            .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .persist()
      time("oriented persist")(oriented.count())
      println(s"  oriented partitions: ${oriented.rdd.getNumPartitions}")
      val adj = oriented.groupBy(col("u").as("node"))
        .agg(sort_array(collect_list(col("v"))).as("nbrs"))
      time("adj agg")(noop(adj))
      import org.apache.spark.sql.graft.ColumnBridge
      val isect = ColumnBridge.column(graft.expressions.SortedLongArrayIntersect(
        ColumnBridge.expression(col("nu").cast(ArrayType(LongType))),
        ColumnBridge.expression(col("nv").cast(ArrayType(LongType)))))
      val tri = oriented
        .join(broadcast(adj.select(col("node").as("u"), col("nbrs").as("nu"))), Seq("u"))
        .join(broadcast(adj.select(col("node").as("v"), col("nbrs").as("nv"))), Seq("v"))
        .select(col("u"), col("v"), explode(isect).as("w"))
      time("tri close (explode isect)")(noop(tri))
      val counts = tri
        .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
      time("tri counts")(noop(counts))
      time("full q61 registry")(noop(
        SparkEntry.queries("q61_triangles")(spark, sfDir)))
      time("full q77 registry")(noop(
        SparkEntry.queries("q77_graph_profile")(spark, sfDir)))
      oriented.unpersist(); und.unpersist()
    }
    spark.stop()
  }
}
