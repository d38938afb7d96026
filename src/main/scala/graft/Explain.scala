package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally run) a
  * registered query, for shuffle/pushdown/codegen audits.
  *
  * {{{ sbt "runMain graft.Explain <queryName> [run]" }}}
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 4).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, s"usage: Explain <queryName> [run]; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(args(0))(spark, sfDir)
    df.explain("formatted")
    if (args.length > 1 && args(1) == "run") {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[explain] run took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
