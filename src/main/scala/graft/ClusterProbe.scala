package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run the most expensive registry queries on a REAL
  * multi-executor deployment — `local-cluster[2,16,<mem>]`, two
  * separate executor JVMs — instead of local[n]'s single JVM.
  *
  * What this surfaces that local[n] cannot: closure/broadcast
  * SERIALIZATION (local mode shares the driver heap, so an
  * unserializable or unexpectedly huge broadcast never ships),
  * shuffle-over-network serialization of custom expression state, and
  * executor-death sensitivity of driver-held model state. The r13
  * fidelity probe (VERDICT r12 item 7): correctness at this scale is
  * already oracle-certified; here each query just has to COMPLETE on
  * a real two-executor topology and return rows, and the timing is
  * recorded for the artifact (not comparable to local[32] bench
  * numbers — different executor count, JVM warmup per executor).
  *
  * Usage: runMain graft.ClusterProbe <sfDir> <outFile> [names-csv]
  */
object ClusterProbe {
  /** BENCH_full top-20 by cost at r12 — the plan-cost watchlist. */
  val DefaultQueries: Seq[String] = Seq(
    "q77_graph_profile", "q61_triangles", "e21_graph_recall_sweep",
    "e20_anisotropy", "d22_substrings_grouped", "q52_bfs_reach",
    "x46_hash_classifier", "d19_quality_survivor", "q70_hierarchy_rollup",
    "e10_ivf_recall_sweep", "x32_source_drift_matrix", "d6_dup_clusters",
    "d23_substring_removal_owned", "d16_lsh_band_sweep",
    "p7_leakage_free_split", "q59_pagerank", "s7_graph_ann",
    "x44_winnowing", "d21_substring_removal", "q69_bucketed_join")

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.ClusterProbe <sfDir> <outFile> [names-csv]")
      sys.exit(2)
    }
    val (sfDir, outFile) = (args(0), args(1))
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else DefaultQueries
    val execMem = sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM_MB", "12288")
    val spark = SparkSession.builder()
      .master(s"local-cluster[2,16,$execMem]")
      .appName("graft-cluster-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // executor JVMs are spawned fresh: they need the repo classes
      // (and the driver's --add-opens set, via build-time javaOptions)
      .config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_CLASSPATH",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
      .config("spark.executor.extraJavaOptions",
        Seq("java.lang", "java.lang.invoke", "java.lang.reflect",
          "java.io", "java.net", "java.nio", "java.util",
          "java.util.concurrent", "java.util.concurrent.atomic",
          "sun.nio.ch", "sun.nio.cs", "sun.security.action",
          "sun.util.calendar")
          .map(p => s"--add-opens=java.base/$p=ALL-UNNAMED").mkString(" "))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = names.map { name =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val r =
        try {
          val n = SparkEntry.queries(name)(spark, sfDir).count()
          if (n > 0) "ok" else "EMPTY"
        } catch { case e: Throwable =>
          s"FAIL: ${Option(e.getMessage).getOrElse(e.toString).take(160)}"
        }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cluster-probe] $name%-28s $sec%7.2f s  $r")
      (name, sec, r)
    }
    val failed = results.filterNot(_._3 == "ok")
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val line = s"""{"master":"local-cluster[2,16,$execMem]","sf":"$sfDir","queries":{${
      results.map { case (n, s, r) =>
        s""""$n":{"sec":${f"$s%.2f"},"status":"${esc(r)}"}"""
      }.mkString(",")}},"n_fail":${failed.length}}"""
    println(line)
    java.nio.file.Files.writeString(java.nio.file.Path.of(outFile), line + "\n")
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
