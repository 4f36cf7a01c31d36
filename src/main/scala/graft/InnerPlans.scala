package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (not part of the library): dump the INNER frames of the
  * iterative/eager queries whose terminal plans are truncated by
  * localCheckpoint before `.explain` can see them (the r13 evidence
  * gap: q52/q59/q61/q77 dumps showed only checkpoint scans). Each dump
  * is the pre-checkpoint physical plan of the frame a claim is about —
  * the SHUFFLE_HASH edge builds, one BFS round, one CC round, the
  * triangle close.
  *
  * Usage: runMain graft.InnerPlans <sfDir> <outDir>
  */
object InnerPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "plans/r14"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-innerplans")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def dump(name: String, df: DataFrame): Unit = {
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(s"$outDir/$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      println(s"[innerplans] wrote $outDir/$name.txt")
    }
    def t(n: String) = spark.read.parquet(s"$sfDir/$n.parquet")

    // q52/q61/q77 co-purchase edge build: the SHUFFLE_HASH pick (r13
    // claim) — the hint must surface as ShuffledHashJoin, not SMJ
    val li = t("lineitem").select(col("l_orderkey").as("ok"),
      col("l_partkey").as("pk"))
    val edgesQ52 = li.as("a").join(li.as("b").hint("SHUFFLE_HASH"), Seq("ok"))
      .filter(col("a.pk") =!= col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst"))
    dump("inner_q52_edge_build_shj", edgesQ52)

    // q59 edge build: SHUFFLE_HASH on the unique-key orders join
    val liS = t("lineitem")
      .select(col("l_suppkey").as("src"), col("l_orderkey").as("ok"))
    val o = t("orders").select(col("o_orderkey").as("ok"),
      (col("o_custkey") + 1000000L).as("dst"))
    dump("inner_q59_edge_build_shj",
      liS.join(o.hint("SHUFFLE_HASH"), Seq("ok")).select("src", "dst"))

    // one BFS round over a persisted edge table: broadcast frontier
    // probe + distinct + anti-join (the q52 per-round shape)
    val edges = edgesQ52.repartition(col("src")).persist()
    val seeds = t("part").filter(col("p_size") === 50)
      .select(col("p_partkey").as("node")).distinct()
      .withColumn("dist", lit(0L)).localCheckpoint(true)
    val round1 = edges
      .join(broadcast(seeds.select(col("node").as("src"))), Seq("src"))
      .select(col("dst").as("node")).distinct()
      .join(broadcast(seeds.select("node")), Seq("node"), "left_anti")
      .withColumn("dist", lit(1L))
    dump("inner_q52_bfs_round", round1)

    // the triangle close over the canonical co-purchase edges: the
    // oriented/adj/intersect pipeline with its broadcast builds (the
    // q61/q77 shape). Reconstructed here pre-checkpoint: degree join +
    // orientation + adjacency + close — exactly Graphs.closeOriented's
    // plan with the checkpoint removed.
    val und = li.as("a").join(li.as("b").hint("SHUFFLE_HASH"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("src"), col("b.pk").as("dst")).distinct()
      .persist()
    val deg = und.select(col("src").as("v"))
      .unionByName(und.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("dg")).persist()
    val withDeg = und
      .join(broadcast(deg.select(col("v").as("src"), col("dg").as("du"))), Seq("src"))
      .join(broadcast(deg.select(col("v").as("dst"), col("dg").as("dv"))), Seq("dst"))
    dump("inner_q77_withdeg_one_pass", withDeg)
    val oriented = withDeg
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("src") < col("dst")),
          struct(col("src").as("u"), col("dst").as("v")))
          .otherwise(struct(col("dst").as("u"), col("src").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist()
    val adj = oriented.groupBy(col("u").as("node"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs")).persist()
    import org.apache.spark.sql.graft.ColumnBridge
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val isect = ColumnBridge.column(graft.expressions.SortedLongArrayIntersect(
      ColumnBridge.expression(col("nu").cast(ArrayType(LongType))),
      ColumnBridge.expression(col("nv").cast(ArrayType(LongType)))))
    val tri = oriented
      .join(broadcast(adj.select(col("node").as("u"), col("nbrs").as("nu"))), Seq("u"))
      .join(broadcast(adj.select(col("node").as("v"), col("nbrs").as("nv"))), Seq("v"))
      .select(col("u"), col("v"), explode(isect).as("w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    dump("inner_q61_triangle_close", tri)

    // one CC round (the d6/d19 loop body): edges ⋈ labels min-agg +
    // pointer jump — the fused lazy-checkpoint-plus-count shape's plan
    val sym = spark.range(0, 1000).select(col("id").as("src"),
      (col("id") % 97).as("dst"))
    val ccEdges = sym.union(sym.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist()
    val labels = ccEdges.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("lbl"))
      .localCheckpoint(true)
    val fromNbrs = ccEdges
      .join(labels.withColumnRenamed("id", "src"), Seq("src"))
      .groupBy(col("dst").as("id")).agg(min("lbl").as("nlbl"))
    val stepped = labels.join(fromNbrs, Seq("id"), "left")
      .select(col("id"), col("lbl").as("old"),
        least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("mid"))
    val jump = stepped.select(col("id").as("jid"), col("mid").as("jlbl"))
    val next = stepped.join(jump, col("mid") === col("jid"), "left")
      .select(col("id"), col("old"),
        least(col("mid"), coalesce(col("jlbl"), col("mid"))).as("lbl"))
    dump("inner_d6_cc_round", next)

    spark.stop()
  }
}
