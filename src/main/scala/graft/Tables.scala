package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries read through here so schema hazards are handled in one
  * place. The one real hazard: `events.ts` is parquet TIMESTAMP(NANOS)
  * (pandas-written), which Spark 4 refuses to read as a timestamp
  * ([PARQUET_TYPE_ILLEGAL]). We read it as raw nanos via the legacy
  * conf `spark.sql.legacy.parquet.nanosAsLong` — which every graft
  * session builder (Verify, Bench, Main, SparkSpec) sets at
  * construction, so loaders stay pure — and truncate to microseconds,
  * the same truncation DuckDB applies when it coerces ns→us on read,
  * so oracle comparisons line up exactly.
  */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")

  /** Raise scan parallelism to the session default when the source is
    * narrower (a small table is often a single parquet row group = ONE
    * scan partition, serializing any CPU-heavy per-row work — shingling,
    * hashing, bigram explode — onto one core). At scale this is a no-op:
    * a 100-TB scan already has more partitions than cores, and the guard
    * keeps the repartition from ever ADDING a shuffle there. Only use
    * upstream of genuinely expensive per-row transforms; the shuffle it
    * does add locally is bounded by the (small) source size.
    */
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** `events` with `ts` normalized to a microsecond TIMESTAMP.
    * Expects `spark.sql.legacy.parquet.nanosAsLong=true` on the session
    * (set by all graft session builders). A foreign session lacking it
    * still works — the flag is set here with a WARNING instead of
    * failing, because the alternative is [PARQUET_TYPE_ILLEGAL]
    * downstream; the warning exists because the flag changes how any
    * ns-timestamp parquet reads session-wide, which the caller should
    * know they've opted into.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    if (!spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true")) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        "setting spark.sql.legacy.parquet.nanosAsLong=true session-wide to read " +
          "events.parquet (TIMESTAMP(NANOS)); prefer setting it at session construction " +
          "(see Verify/Bench/SparkSpec)",
      )
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    table(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
}
