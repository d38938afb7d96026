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

  /** One row of LSH band state input: a document's signature in one
    * band.
    */
  final case class BandRow(band: Int, sig: String, doc_id: Long, arrival: java.sql.Timestamp)

  /** A flagged near-duplicate candidate: `doc_id` collided with the
    * band owner `dup_of` in `band`.
    */
  final case class NearDup(doc_id: Long, band: Int, dup_of: Long)

  /** Per-row MinHash band signatures — the SAME kernel as the batch
    * `dedup_minhash_lsh` family (identical md5 slice and affine
    * permutation constants, [[graft.queries.DedupQueries.perms]]), but
    * computed entirely inside row-local higher-order expressions: no
    * explode, no groupBy, STATELESS — exactly what a streaming stage
    * needs before the keyed state step.
    */
  def bandSignatures(docs: DataFrame, rowsPerBand: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val nBands = 16 / rowsPerBand
    val hs = "transform(word_shingles(w, 3), sh -> CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT))"
    val mins = graft.queries.DedupQueries.perms.map { case (a, b) =>
      s"array_min(transform(hs, h -> (h * ${a}L + ${b}L) % 4294967296L))"
    }
    val bandStructs = (0 until nBands)
      .map { bnd =>
        val sig = (bnd * rowsPerBand until (bnd + 1) * rowsPerBand)
          .map(i => s"CAST(${mins(i)} AS STRING)").mkString("concat_ws('|', ", ", ", ")")
        s"struct($bnd AS band, $sig AS sig)"
      }
      .mkString("array(", ", ", ")")
    docs
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 3)
      .withColumn("hs", expr(hs))
      .select(col("doc_id"), col("arrival"), explode(expr(bandStructs)).as("b"))
      .select(col("b.band").as("band"), col("b.sig").as("sig"), col("doc_id"), col("arrival"))
  }

  /** Streaming near-duplicate suppression — the stateful form of the
    * batch `dedup_minhash_cross`: every arriving document's band
    * signatures probe a keyed state store of (band, sig) → first-owner
    * doc_id, flagging collisions with documents from THIS batch and any
    * earlier one. State is per signature (8 bytes + the sig string),
    * partitioned by (band, sig) — the same key the batch band join
    * shuffles on — and reclaimed by an event-time timeout `stateTtl`
    * past the watermark: a duplicate arriving later than that is the
    * periodic batch pass's job, identical to the exact-dedup contract
    * above. Emits `NearDup(doc_id, band, dup_of)` candidates (append
    * mode); exact verification downstream stays the caller's step, as
    * in every LSH path here.
    */
  def nearDupStream(
      docs: DataFrame,
      lateness: String = "10 minutes",
      stateTtlMs: Long = 60L * 60 * 1000,
  ): org.apache.spark.sql.Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def update(
        key: (Int, String),
        it: Iterator[BandRow],
        state: GroupState[Long],
    ): Iterator[NearDup] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        // deterministic owner: earliest arrival, then lowest id
        val rows = it.toSeq.sortBy(r => (r.arrival.getTime, r.doc_id))
        val out = Seq.newBuilder[NearDup]
        var owner = if (state.exists) Some(state.get) else None
        rows.foreach { r =>
          owner match {
            case Some(o) if o != r.doc_id => out += NearDup(r.doc_id, key._1, o)
            case Some(_) => ()
            case None =>
              owner = Some(r.doc_id)
              state.update(r.doc_id)
          }
        }
        if (rows.nonEmpty && owner.nonEmpty) {
          val maxArrival = rows.map(_.arrival.getTime).max
          state.setTimeoutTimestamp(maxArrival + stateTtlMs)
        }
        out.result().iterator
      }
    }

    bandSignatures(docs)
      .withWatermark("arrival", lateness)
      .as[BandRow]
      .groupByKey(r => (r.band, r.sig))
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }

  /** The store-backed alternative to [[nearDupStream]]'s query state:
    * one `foreachBatch` body that screens a micro-batch against the
    * PERSISTED corpus bands ([[graft.operators.BandsStore]]), flags
    * within-batch collisions, then absorbs the batch into the store —
    * so the streaming and batch dedup pipelines share ONE corpus
    * memory: documents deduplicated in flight are exactly the ones a
    * later batch `dedup_minhash_cross` run would have caught, and
    * vice versa. Returns the flagged pairs `(doc_id, dup_of)` for the
    * caller's sink. Unlike the TTL-bounded query state, the store
    * remembers the corpus indefinitely at parquet cost — pick by
    * whether "duplicate of last hour" or "duplicate of the corpus" is
    * the contract.
    *
    * Ordering: screen BEFORE absorb (a batch must not collide with
    * itself through the store); within-batch collisions come from a
    * band self-join on the batch's own (small) signature set.
    */
  def screenAndAbsorbBatch(batchDocs: DataFrame, storePath: String): DataFrame = {
    val spark = batchDocs.sparkSession
    val sigs = bandSignatures(batchDocs).select("band", "sig", "doc_id").cache()
    try {
      val storeExists =
        try spark.read.parquet(storePath).columns.contains("band")
        catch { case _: Throwable => false }
      val vsStore =
        if (!storeExists) spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0L).as("dup_of")).limit(0)
        else {
          val hist = spark.read.parquet(storePath)
          sigs.as("x")
            .join(hist.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
            .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
        }
      val within = sigs.as("x")
        .join(sigs.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") > col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
      val flags = vsStore.union(within).distinct().collect() // materialize BEFORE absorb
      sigs.select("doc_id", "band", "sig")
        .write.mode("append").partitionBy("band").parquet(storePath)
      import spark.implicits._
      flags.map(r => (r.getLong(0), r.getLong(1))).toSeq.toDF("doc_id", "dup_of")
    } finally {
      sigs.unpersist()
      ()
    }
  }
}
