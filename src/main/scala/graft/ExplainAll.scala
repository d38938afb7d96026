package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for MANY registered queries into
  * files in one JVM — the per-query [[Explain]] pays sbt+Spark startup per
  * plan, which at 40 plans is ~20 minutes of pure overhead.
  *
  * {{{ sbt "runMain graft.ExplainAll <outDir> <suffix> [name ...]" }}}
  *
  * With no names, dumps every registered query. Each plan lands at
  * `<outDir>/<name>_<suffix>.txt`. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
  * (same contract as [[Explain]]).
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ExplainAll <outDir> <suffix> [name ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[explain-all] unknown query: $name")
        case Some(fn) =>
          try {
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode,
            )
            java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
            println(s"[explain-all] wrote $name")
          } catch {
            case e: Throwable => System.err.println(s"[explain-all] $name failed: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
