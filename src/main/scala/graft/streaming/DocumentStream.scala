package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming face of the training-data pipeline: documents arrive as
  * parquet batches and are cleaned in flight — quality-gated,
  * DECONTAMINATED against a static benchmark corpus (the streaming form
  * of `text_decontaminate`), and exact-deduplicated within the
  * watermark.
  *
  * Decontamination is a PER-ROW PREDICATE, not a join: the benchmark
  * shingle set is small by construction (benchmarks are thousands of
  * docs, not billions), so it ships as a plan literal —
  * `arrays_overlap(word_shingles(w), <literal set>)` — which Spark
  * broadcasts with the plan. That keeps the stream STATELESS for the
  * contamination step: no stream-stream join (a stream-derived
  * "contaminated ids" side would be one), no per-doc aggregation state.
  * The batch query's `>= 2 shared shingles` refinement needs per-doc
  * counting; the stream applies the strictest gate (ANY collision) and
  * leaves threshold tuning to the batch pass. Exact dedup uses
  * `dropDuplicatesWithinWatermark` on the content hash — state is
  * reclaimed at the watermark; a duplicate arriving beyond the lateness
  * bound is the periodic batch dedup's job, not the stream's.
  */
object DocumentStream {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("arrival", TimestampType),
  ))

  /** File-source stream of parquet document batches dropped into `dir`. */
  def readDocs(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(dir)

  /** Distinct 5-gram shingles of a static benchmark corpus, collected
    * for use as the [[cleanStream]] plan literal. The guard is the
    * scale contract: a "benchmark" that doesn't fit a driver literal
    * is a training corpus, and belongs in the batch join form
    * (`text_decontaminate`) instead.
    */
  def benchmarkShingles(eval: DataFrame, maxShingles: Int = 1000000): Seq[String] = {
    graft.functions.GraftFunctions.register(eval.sparkSession)
    val sh = eval
      .select(split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 5)
      .select(explode(expr("word_shingles(w, 5)")).as("sh"))
      .distinct()
      .limit(maxShingles + 1)
      .collect()
      .map(_.getString(0))
      .toSeq
    require(
      sh.size <= maxShingles,
      s"benchmark shingle set exceeds $maxShingles — use the batch decontamination join",
    )
    sh
  }

  /** Quality-gate, decontaminate, and exact-dedup an incoming document
    * stream. Returns a streaming DataFrame of clean documents.
    */
  def cleanStream(
      docs: DataFrame,
      evalShingles: Seq[String],
      minWords: Int = 5,
      lateness: String = "10 minutes",
  ): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= minWords) // quality gate doubles as shingle guard
      .where(!arrays_overlap(expr("word_shingles(w, 5)"), typedLit(evalShingles)))
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("arrival", lateness)
      .dropDuplicatesWithinWatermark("content_hash")
      .select("doc_id", "text", "lang", "arrival")
  }
}
