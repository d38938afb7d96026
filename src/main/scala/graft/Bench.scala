package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet paths so the first measured query
    // isn't charged for session startup.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // Two timed runs per query, report the min: the first run pays
    // per-query codegen compilation; steady-state throughput is what a
    // resident engine delivers.
    //
    // The timing action is a noop-format write, NOT count(): count()
    // lets Catalyst prune every projected column, so expensive projected
    // expressions (e.g. cosine similarities) would never be evaluated
    // and the bench would measure less work than Verify verifies. The
    // noop sink materializes every output column and discards the rows.
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    def time(name: String, fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); () }
      catch {
        // keep timing but NEVER silently: a broken query must not read
        // as a near-zero-cost success in the report
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          failed += name
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // Suite hygiene: a query that caches and forgets (or a temp view
      // holding a plan alive) must not tax every query after it.
      spark.catalog.clearCache()
      dt
    }
    // SPARK_GRAFT_BENCH_FILTER: local iteration aid (substring match);
    // the driver runs without it -> all queries.
    val filter = sys.env.getOrElse("SPARK_GRAFT_BENCH_FILTER", "")
    val results = SparkEntry.queries.toSeq.filter(_._1.contains(filter)).sortBy(_._1).map { case (name, fn) =>
      name -> math.min(time(name, fn), time(name, fn))
    }
    // The driver captures only the LAST ~2000 chars of output and parses
    // the JSON line out of that window (BENCH_r01/r02 both came back
    // parsed:null because the full-precision line overflowed it). Keep
    // the line compact: 2-decimal seconds per query, and print it after
    // spark.stop() so nothing but the sbt epilogue follows it.
    // Locale.ROOT: f"$v%.2f" uses the default locale — a comma-decimal
    // locale would emit invalid JSON on the one line that must parse
    def sec(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + sec(v) }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // Self-identify partial runs (SPARK_GRAFT_BENCH_FILTER set): report
    // the active filter + query count so a filtered total can't be
    // mistaken for the full suite.
    val filterJson = if (filter.nonEmpty) s""","filter":"$filter"""" else ""
    val line =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","n":${results.size}$filterJson,""" +
        s""""queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    spark.stop()
    println(line)
  }
}
