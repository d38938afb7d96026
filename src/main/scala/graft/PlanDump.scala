package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: prints the executed physical plan of each named
  * registered query at sf0.001 — the evidence source for
  * ARCHITECTURE.md's plan-audit table.
  *
  * `sbt "runMain graft.PlanDump ann_knn_join multimodal_decode"`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      println(s"===== $name")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
