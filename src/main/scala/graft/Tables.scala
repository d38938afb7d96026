package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries read through here so schema hazards are handled in one
  * place. The one real hazard: `events.ts` is parquet TIMESTAMP(NANOS)
  * (pandas-written), which Spark 4 refuses to infer as a timestamp
  * ([PARQUET_TYPE_ILLEGAL]). An EXPLICIT user schema mapping `ts` to
  * LongType sidesteps inference entirely — no session conf involved —
  * and the loader truncates the raw nanos to microseconds, the same
  * truncation DuckDB applies when it coerces ns→us on read, so oracle
  * comparisons line up exactly.
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

  /** The driver's events schema (TESTDATA.md), with `ts` pinned to
    * LongType: providing the schema (instead of inferring it from the
    * footer) is what lets Spark read TIMESTAMP(NANOS) as raw nanos
    * without the session-wide `spark.sql.legacy.parquet.nanosAsLong`
    * flag. Pinning also skips the footer-inference pass — a scan on a
    * 10⁶-file table starts without reading any footers.
    */
  private val eventsRawSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  /** `events` with `ts` normalized to a microsecond TIMESTAMP. Pure:
    * works on any session (no conf read, no conf mutation).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema(eventsRawSchema)
      .parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
