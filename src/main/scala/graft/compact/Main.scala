package graft.compact

import org.apache.spark.sql.SparkSession

/** Config resolution + entry point (reference O11/O12: configurator.py
  * resolves env vs injected config, app.py wires logging and runs
  * `compact()` — SURVEY.md §2.1).
  *
  * Environment surface mirrors the reference's knobs:
  *   GRAFT_DATA_PATH      root of the partitioned lake (required;
  *                        s3a://bucket/prefix or any Hadoop FS URI —
  *                        endpoint/credentials ride the standard
  *                        spark.hadoop.fs.s3a.* configs)
  *   TARGET_FILE_SIZE_GB  candidate threshold & output size target (0.3)
  *   CHUNKED_ROWS         max rows per output file (1000000)
  *   FRESHNESS_DAYS       min age before a new file is compacted (5)
  *   SKIP_SOURCE_TYPE_CURRENT_MONTH  comma list (AWS,Azure)
  *   MAX_CONCURRENT_LEAVES           merge-job pool size (4)
  */
object Main {

  def configFromEnv(env: Map[String, String]): CompactorConfig =
    CompactorConfig(
      targetFileBytes = (env.getOrElse("TARGET_FILE_SIZE_GB", "0.3").toDouble * (1L << 30)).toLong,
      maxRowsPerFile = env.getOrElse("CHUNKED_ROWS", "1000000").toLong,
      freshnessDays = env.getOrElse("FRESHNESS_DAYS", "5").toInt,
      skipProvidersCurrentMonth = env
        .getOrElse("SKIP_SOURCE_TYPE_CURRENT_MONTH", "AWS,Azure")
        .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      maxConcurrentLeaves = env.getOrElse("MAX_CONCURRENT_LEAVES", "4").toInt,
    )

  def main(args: Array[String]): Unit = {
    val root = args.headOption
      .orElse(sys.env.get("GRAFT_DATA_PATH"))
      .getOrElse(sys.error("GRAFT_DATA_PATH (or argv[0]) is required"))
    val spark = SparkSession.builder()
      .appName("graft-compactor")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val results = Compactor.run(spark, root, configFromEnv(sys.env))
    val (ok, bad) = results.partition(_.success)
    println(s"[compact] ${ok.size} groups compacted, ${bad.size} failed")
    bad.foreach(r => println(s"[compact] FAILED ${r.leaf}/${r.stem}: ${r.error.getOrElse("?")}"))
    spark.stop()
    if (bad.nonEmpty) sys.exit(1)
  }
}
