package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries read through here so schema hazards are handled in one
  * place. The one real hazard: `events.ts` has shipped as BOTH parquet
  * TIMESTAMP(NANOS) (pandas-written, earlier rounds) and TIMESTAMP(MICROS)
  * (current fixtures). Spark 4 refuses to infer NANOS as a timestamp
  * ([PARQUET_TYPE_ILLEGAL]), so the loader sniffs the unit once (one
  * driver-side footer inference) and picks the matching explicit schema:
  * MICROS reads natively; NANOS maps `ts` to LongType — sidestepping
  * inference, no session conf involved — and truncates raw nanos to
  * microseconds, the same truncation DuckDB applies when it coerces
  * ns→us on read, so oracle comparisons line up exactly either way.
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
    // Estimate scan parallelism from plan statistics instead of probing
    // df.rdd.getNumPartitions — the RDD probe materializes the physical
    // RDD lineage just to read a planner-level fact. sizeInBytes for a
    // file relation is the file-length sum (metadata only); partitions ≈
    // ceil(bytes / maxPartitionBytes) is exactly the split math the scan
    // will do. Conservative in the right direction: a small table always
    // estimates low and repartitions; a 100-TB scan estimates far above
    // target and the guard stays a no-op.
    val maxPartitionBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      df.sparkSession.conf.get("spark.sql.files.maxPartitionBytes", "128m"),
    )
    val sz = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // a relation with NO computed stats reports the defaultSizeInBytes
    // sentinel (Long.MaxValue) — "huge" there means "unknown", and
    // skipping the guard on unknown is exactly backwards for the
    // CPU-bound per-row work this feeds; fall back to the physical
    // probe for those rare sources instead
    if (sz >= BigInt(Long.MaxValue)) {
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    } else {
      val estPartitions = sz / math.max(1L, maxPartitionBytes) + 1
      if (estPartitions < target) df.repartition(target) else df
    }
  }
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The driver's events schema (TESTDATA.md) in its two variants: `ts`
    * pinned to LongType (NANOS fixtures — an explicit user schema is what
    * lets Spark read TIMESTAMP(NANOS) as raw nanos without the
    * session-wide `spark.sql.legacy.parquet.nanosAsLong` flag) or to
    * TimestampType (MICROS fixtures). Pinning either way also skips the
    * per-query footer-inference pass — a scan on a 10⁶-file table starts
    * without reading any footers beyond the one-time unit sniff.
    */
  private val eventsRawSchema =
    "event_id BIGINT, ts BIGINT, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
  private def eventsTsSchema(tsType: String) =
    s"event_id BIGINT, ts $tsType, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"

  /** `ts`'s inferable Spark type at this path: TIMESTAMP(MICROS) infers
    * as TimestampNTZType (pandas writes isAdjustedToUTC=false) or
    * TimestampType; TIMESTAMP(NANOS) makes inference throw
    * [PARQUET_TYPE_ILLEGAL] → None. One footer read per path per JVM —
    * memoized so repeated query builds against the same fixture dir stay
    * footer-free. Only successful sniffs are cached: a transient IO
    * failure must not permanently route a MICROS fixture through the
    * nanos branch (which would silently divide its values by 1000), so
    * anything other than the specific NANOS refusal propagates and the
    * next call re-sniffs.
    */
  private val tsType = scala.collection.concurrent.TrieMap.empty[String, Option[org.apache.spark.sql.types.DataType]]

  private def sniffTsType(spark: SparkSession, path: String): Option[org.apache.spark.sql.types.DataType] =
    try Some(spark.read.parquet(path).schema("ts").dataType)
    catch {
      // The one failure that MEANS nanos: Spark 4 refuses TIMESTAMP(NANOS)
      // inference with [PARQUET_TYPE_ILLEGAL]. Every other exception
      // (missing file, transient IO) is a real error, not a unit signal.
      case e: org.apache.spark.sql.AnalysisException
          if Option(e.getCondition).exists(_.contains("PARQUET_TYPE_ILLEGAL")) ||
            e.getMessage.contains("PARQUET_TYPE_ILLEGAL") =>
        None
    }

  /** `events` with `ts` normalized to a microsecond TIMESTAMP (session-tz
    * semantics; every session here pins UTC, making the NTZ→LTZ cast a
    * value identity). Pure: works on any session (no conf read, no conf
    * mutation).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val path = s"$sfDir/events.parquet"
    val inferred = tsType.getOrElseUpdate(path, sniffTsType(spark, path))
    inferred match {
      case Some(TimestampType) =>
        spark.read.schema(eventsTsSchema("TIMESTAMP")).parquet(path)
      case Some(TimestampNTZType) =>
        spark.read
          .schema(eventsTsSchema("TIMESTAMP_NTZ"))
          .parquet(path)
          .withColumn("ts", col("ts").cast(TimestampType))
      case _ =>
        spark.read
          .schema(eventsRawSchema)
          .parquet(path)
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    }
  }
}
