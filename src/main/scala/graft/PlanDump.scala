package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump a registered query's optimized + executed plan to a
  * file for offline inspection (lambda-inlining audits, exchange
  * counts, pushdown checks). Not part of the library.
  *
  * Usage: runMain graft.PlanDump <queryName> <sfDir> <outFile>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: runMain graft.PlanDump <queryName> <sfDir> <outFile>")
      sys.exit(2)
    }
    val Array(name, sfDir, outFile) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val txt = new StringBuilder
    txt ++= "== OPTIMIZED ==\n" ++= df.queryExecution.optimizedPlan.toString
    txt ++= "\n== PHYSICAL ==\n" ++= df.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Path.of(outFile),
      txt.toString)
    println(s"[plandump] wrote $outFile")
    spark.stop()
  }
}
