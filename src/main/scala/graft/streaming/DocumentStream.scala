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
    * band. `hs` carries the doc's DISTINCT shingle hashes when exact
    * verification is on (empty otherwise, keeping the shuffle narrow).
    */
  final case class BandRow(band: Int, sig: String, doc_id: Long, arrival: java.sql.Timestamp, hs: Seq[Long])

  /** Keyed state of [[nearDupStream]]: the band owner and (when
    * verifying) its shingle-hash set.
    */
  final case class BandOwner(doc_id: Long, hs: Seq[Long])

  /** Exact Jaccard over distinct shingle-hash sets — the SAME quantity
    * the batch `dedup_minhash_verify` thresholds (one md5-slice hash per
    * distinct shingle on both paths, so hash collisions bias both
    * identically).
    */
  private def exactJaccard(x: Seq[Long], y: Seq[Long]): Double = {
    if (x.isEmpty || y.isEmpty) return 0.0
    val xs = x.toSet
    val inter = y.count(xs.contains)
    inter.toDouble / (xs.size + y.size - inter)
  }

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
  def bandSignatures(docs: DataFrame, rowsPerBand: Int = 4, withShingles: Boolean = false): DataFrame = {
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
    val base = docs
      .withColumn("w", split(col("text"), " "))
      .where(size(col("w")) >= 3)
      .withColumn("hs", expr(hs))
    val core = Seq(col("b.band").as("band"), col("b.sig").as("sig"), col("doc_id"), col("arrival"))
    if (withShingles)
      base
        .select(col("doc_id"), col("arrival"), array_distinct(col("hs")).as("hs"), explode(expr(bandStructs)).as("b"))
        .select(core :+ col("hs"): _*)
    else
      base
        .select(col("doc_id"), col("arrival"), explode(expr(bandStructs)).as("b"))
        .select(core: _*)
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
    * above.
    *
    * With `verifyMinJaccard` set, band collisions are VERIFIED in-state
    * before emission: the owner keeps its distinct shingle-hash set and
    * each collider's exact Jaccard against it must clear the threshold
    * — a band-colliding-but-dissimilar pair (the LSH false positive) is
    * NOT flagged, so every emitted flag carries batch
    * `dedup_minhash_verify` semantics. One structural narrowing vs the
    * batch pass: state keeps ONE owner per (band, sig), so two
    * NON-owner colliders that are duplicates of each other but not of
    * the owner pair only through some OTHER shared band — near-dups
    * sharing no other band surface in the periodic batch pass, the
    * same division of labor as the TTL. Note: enabling/disabling
    * verification changes the state encoder (owner id vs owner id +
    * shingle set) — restart such a stream from a FRESH checkpoint.
    * The cost is honest and bounded:
    * state grows from 8 bytes to O(doc shingles) per (band, sig) key,
    * reclaimed by the same TTL. With `verifyMinJaccard = None` the
    * stream emits raw candidates and verification stays the caller's
    * downstream step, as before.
    */
  def nearDupStream(
      docs: DataFrame,
      lateness: String = "10 minutes",
      stateTtlMs: Long = 60L * 60 * 1000,
      verifyMinJaccard: Option[Double] = None,
  ): org.apache.spark.sql.Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    def update(
        key: (Int, String),
        it: Iterator[BandRow],
        state: GroupState[BandOwner],
    ): Iterator[NearDup] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        // deterministic owner: earliest arrival, then lowest id
        val rows = it.toSeq.sortBy(r => (r.arrival.getTime, r.doc_id))
        val out = Seq.newBuilder[NearDup]
        var owner = state.getOption
        rows.foreach { r =>
          owner match {
            case Some(o) if o.doc_id != r.doc_id =>
              if (verifyMinJaccard.forall(exactJaccard(r.hs, o.hs) >= _))
                out += NearDup(r.doc_id, key._1, o.doc_id)
            case Some(_) => ()
            case None =>
              owner = Some(BandOwner(r.doc_id, r.hs))
              state.update(owner.get)
          }
        }
        if (rows.nonEmpty && owner.nonEmpty) {
          val maxArrival = rows.map(_.arrival.getTime).max
          state.setTimeoutTimestamp(maxArrival + stateTtlMs)
        }
        out.result().iterator
      }
    }

    val sigs =
      if (verifyMinJaccard.isDefined) bandSignatures(docs, withShingles = true)
      else bandSignatures(docs).withColumn("hs", expr("CAST(array() AS ARRAY<BIGINT>)"))
    sigs
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
    * itself through the store). The materialize-before-absorb step goes
    * through a hidden `.screen-flags` dir under the store (invisible to
    * the band reads — leading-dot paths are filtered by the parquet
    * source), NOT a driver collect: a pathological all-duplicates batch
    * costs executor disk, never driver memory. The returned frame reads
    * that dir and stays valid until the NEXT batch overwrites it —
    * consume it inside the same `foreachBatch` body, which is the only
    * calling convention this method exists for.
    *
    * With `verifyMinJaccard` set, candidates are verified on exact
    * Jaccard before flagging (the batch `dedup_minhash_verify`
    * contract): batch docs' distinct shingle-hash sets are persisted to
    * a hidden `.hs` sidecar table on absorb, so cross-batch candidates
    * verify against history WITHOUT re-reading or re-shingling history
    * text — one join against the compact `.hs` table (ids + hash sets),
    * whose probe side is batch-bounded and broadcastable. Within-batch
    * pairs verify against the batch's own sets.
    */
  def screenAndAbsorbBatch(
      batchDocs: DataFrame,
      storePath: String,
      verifyMinJaccard: Option[Double] = None,
  ): DataFrame = {
    val spark = batchDocs.sparkSession
    val verifying = verifyMinJaccard.isDefined
    val hsPath = s"$storePath/.hs"
    val sigs = bandSignatures(batchDocs, withShingles = verifying).cache()
    try {
      val storeExists =
        try spark.read.parquet(storePath).columns.contains("band")
        catch { case _: Throwable => false }
      val vsStore =
        if (!storeExists) spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0L).as("dup_of")).limit(0)
        else {
          val hist = spark.read.parquet(storePath)
          // the id inequality matters on RE-INGEST: a doc_id already in
          // the store collides with its own rows in every band and, with
          // verification on, would pass at jac=1 — flagging a document
          // as a duplicate of itself (and inviting a consumer to drop
          // the only copy)
          sigs.as("x")
            .join(
              hist.as("y"),
              col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
                col("x.doc_id") =!= col("y.doc_id"),
            )
            .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
        }
      val within = sigs.as("x")
        .join(sigs.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") > col("y.doc_id"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
      val candidates = vsStore.union(within).distinct()
      val flagged =
        if (!verifying) candidates
        else {
          val batchHs = sigs.select(col("doc_id"), col("hs")).dropDuplicates("doc_id")
          val histHs =
            try {
              val h = spark.read.parquet(hsPath)
              if (h.columns.contains("hs")) h else batchHs.limit(0)
            } catch { case _: Throwable => batchHs.limit(0) }
          // dup_of may be a batch doc (within) or a history doc (store);
          // a re-ingested id appears in both with identical sets
          val ownerHs = batchHs.unionByName(histHs).dropDuplicates("doc_id")
          val jac = size(array_intersect(col("nhs"), col("ohs"))).cast("double") /
            size(array_union(col("nhs"), col("ohs")))
          // LEFT join the owner side: a store populated before
          // verification was enabled (or a crash between the band
          // append and the hs append) has band rows with NO recorded
          // shingle set — such a candidate cannot be verified, and
          // silently dropping it would hide a real duplicate forever.
          // It degrades to pre-verify (band-collision) semantics
          // instead: flagged, like every candidate was before
          // verifyMinJaccard existed.
          candidates
            .join(batchHs.select(col("doc_id").as("nd"), col("hs").as("nhs")), col("doc_id") === col("nd"))
            .join(
              ownerHs.select(col("doc_id").as("od"), col("hs").as("ohs")),
              col("dup_of") === col("od"),
              "left",
            )
            .where(col("ohs").isNull || jac >= verifyMinJaccard.get)
            .select(col("doc_id"), col("dup_of"))
        }
      // materialize BEFORE absorb — bounded by executor disk, not driver
      val flagsPath = s"$storePath/.screen-flags"
      flagged.write.mode("overwrite").parquet(flagsPath)
      sigs.select("doc_id", "band", "sig")
        .write.mode("append").partitionBy("band").parquet(storePath)
      if (verifying)
        sigs.select(col("doc_id"), col("hs")).dropDuplicates("doc_id")
          .write.mode("append").parquet(hsPath)
      spark.read.schema("doc_id LONG, dup_of LONG").parquet(flagsPath)
    } finally {
      sigs.unpersist()
      ()
    }
  }

  /** Streaming form of `mix_token_budget`: a `foreachBatch` body that
    * takes each micro-batch's documents per source, in seeded md5
    * order, until that source's cumulative TOKEN budget is exhausted —
    * with the KEPT-token counts carried ACROSS batches in a tiny
    * persisted state table. The contract is a take-while PER BATCH
    * from the carried offset, NOT equality with the batch query over
    * the union of arrivals: within a batch, skipped docs' tokens still
    * block everything after them (cum is monotone), but they do not
    * carry forward — so a budget a large early doc couldn't fit can
    * re-open for a smaller doc in a later batch, which the one-shot
    * batch query (whose cum includes every skipped doc) would reject.
    * That re-opening is deliberate: a stream must not let one oversized
    * document permanently close a source. `mix_token_budget_stream`
    * oracles the exact two-batch semantics.
    *
    * Replay-safety is by construction, not by locking: the state is
    * versioned per batchId (`state-<b>` + `_mix-<b>` marker sealed
    * last), and batch b ALWAYS computes from the newest sealed state
    * STRICTLY BELOW b. foreachBatch replays only the last uncommitted
    * batch, so a replay re-reads the same predecessor, re-derives the
    * same selection (md5 order is a pure function of the batch), and
    * idempotently overwrites its own outputs — every crash window
    * (before the selection write, between selection and state, between
    * state and marker, after the marker) lands on the same answer.
    * States two generations back are reclaimed after the seal.
    *
    * The selection materializes to a hidden `.sel-<b>` dir (the
    * [[screenAndAbsorbBatch]] discipline — executor disk, never a
    * driver collect) and the returned frame reads it; consume it
    * inside the same foreachBatch body. Budget lookups and the
    * carried-counts join are broadcasts of source-cardinality tables;
    * the only batch shuffle is the per-source cumulative-sum window —
    * the batch query's plan, per micro-batch.
    */
  def sampleToBudgetBatch(
      batchDocs: DataFrame,
      statePath: String,
      batchId: Long,
      budgets: Map[String, Long] = Map.empty,
      defaultBudget: Long = Long.MaxValue,
  ): DataFrame = {
    val spark = batchDocs.sparkSession
    import spark.implicits._
    val base = new org.apache.hadoop.fs.Path(statePath)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(base)
    val MarkRe = "_mix-(\\d+)".r
    val sealedIds = fs.listStatus(base)
      .flatMap(e => MarkRe.findFirstMatchIn(e.getPath.getName).map(_.group(1).toLong))
    val pred = sealedIds.filter(_ < batchId).sorted.lastOption
    val prev = pred match {
      case Some(p) => spark.read.parquet(s"$statePath/state-$p")
      case None    => Seq.empty[(String, Long)].toDF("source", "taken")
    }
    val budgetDf =
      if (budgets.isEmpty) None
      else Some(broadcast(budgets.toSeq.toDF("source", "budget")))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("h", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val scored0 = batchDocs.select(
      col("doc_id"),
      col("source"),
      size(split(col("text"), " ")).as("n_tok"),
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)").as("h"),
    )
      .join(broadcast(prev.withColumnRenamed("taken", "taken0")), Seq("source"), "left")
    val withBudget = budgetDf match {
      case Some(b) => scored0.join(b, Seq("source"), "left")
        .withColumn("budget", coalesce(col("budget"), lit(defaultBudget)))
      case None => scored0.withColumn("budget", lit(defaultBudget))
    }
    val scored = withBudget
      .withColumn("cum", sum("n_tok").over(wCum) + coalesce(col("taken0"), lit(0L)))
    val selPath = s"$statePath/.sel-$batchId"
    scored.where(col("cum") <= col("budget"))
      .select("doc_id", "source", "n_tok", "cum")
      .write.mode("overwrite").parquet(selPath)
    val kept = spark.read.schema("doc_id LONG, source STRING, n_tok INT, cum LONG").parquet(selPath)
    val advanced = prev.as("p")
      .join(kept.groupBy("source").agg(sum("n_tok").as("add")).as("a"), Seq("source"), "full_outer")
      .select(col("source"), (coalesce(col("taken"), lit(0L)) + coalesce(col("add"), lit(0L))).as("taken"))
    advanced.write.mode("overwrite").parquet(s"$statePath/state-$batchId")
    if (!fs.exists(new org.apache.hadoop.fs.Path(s"$statePath/_mix-$batchId")))
      fs.create(new org.apache.hadoop.fs.Path(s"$statePath/_mix-$batchId"), false).close()
    // reclaim everything older than the predecessor: a replay of b only
    // ever needs pred's state; pred itself stays until b+1 seals
    sealedIds.filter(id => pred.exists(id < _)).foreach { id =>
      try {
        fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/state-$id"), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/_mix-$id"), false)
        fs.delete(new org.apache.hadoop.fs.Path(s"$statePath/.sel-$id"), true)
        ()
      } catch { case _: Throwable => () }
    }
    kept
  }

  /** Streaming form of the keep-best cluster-representative pipeline: a
    * `foreachBatch` body that absorbs each micro-batch of
    * `(doc_id, text, quality)` documents into a persisted
    * [[graft.operators.ClusterRepStore]] and returns the seal's
    * changefeed — the assert/retract rows a downstream publisher folds
    * to keep exactly one best copy per near-dup cluster across the
    * WHOLE stream history (batch-vs-store merges and displacements
    * included; the batch pipelines share the one-shot MinHash kernel).
    *
    * Replay-safety rides on the store's own `batchTag` idempotence: an
    * at-least-once redelivery of batchId b (same content by the
    * foreachBatch contract) finds its tag sealed — even when a
    * maintenance compact bumped the head since — and gets b's original
    * feed back without absorbing twice; a crash MID-update left no
    * pointer, so the redo sweeps the debris and lands on the same seal.
    */
  def clusterRepBatch(batchDocs: DataFrame, storePath: String, batchId: Long): DataFrame =
    graft.operators.ClusterRepStore.update(
      batchDocs.sparkSession, storePath, batchDocs, batchTag = Some(s"batch-$batchId"))
}
