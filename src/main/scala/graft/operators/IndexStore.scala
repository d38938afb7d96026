package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental inverted-index store for BM25 retrieval — the
  * [[BandsStore]]/[[IvfStore]] screen-and-absorb discipline applied to
  * the search family. A training pipeline's corpus search (dedup
  * triage, contamination forensics) cannot re-derive per-doc term
  * frequencies from 100 TB of text per query; the store persists the
  * postings ONCE and each probe reads only the query terms' hash
  * buckets.
  *
  * Layout at `path` — a manifest-lite ADD-LOG, sealed per generation:
  *
  *   - `add-<seq>/tb=<b>/` — one batch's postings `(word, doc_id, tf)`,
  *     hive-partitioned by the term's hash bucket (xxhash64 %
  *     [[Buckets]]) so a probe is a static partition filter;
  *   - `dl-<seq>/` — that batch's `(doc_id, dl)` document lengths;
  *   - `del-<seq>/` — that generation's TOMBSTONES `(doc_id, dl)`:
  *     docs REMOVED from the corpus (a retention delete, a rewrite's
  *     retraction side). Removal is logical — postings stay put, and
  *     every probe kills a posting whose doc has a LATER tombstone
  *     (`dseq > gseq`, so a doc re-added after its removal scores from
  *     its new edition only); [[compact]] drops tombstoned rows
  *     physically and clears the tombstones.
  *   - `stats-<seq>` — CUMULATIVE corpus stats (n docs, Σdl) as of the
  *     generation — additions added, removals subtracted — one tiny
  *     file, read whole per probe;
  *   - `cursor-<seq>` — when the index is maintained by
  *     [[syncFromLeaf]]: the [[graft.compact.ChangeFeed.Cursor]] this
  *     generation corresponds to (feed seq + counted file set), sealed
  *     WITH the data so crash replays are idempotent by construction;
  *   - `_current-<seq>` — empty pointer, CREATED LAST. A crashed
  *     build/append leaves unsealed dirs a reader never resolves and
  *     the next writer's seq reuses-or-supersedes; the same
  *     create-only pointer contract every sibling store keeps.
  *
  * Probes compute BM25 from (tf, dl) + the current stats at QUERY
  * time, so scores reflect the corpus as of the sealed generation —
  * appends AND removals move n/avgdl/df and thereby every score,
  * exactly like the from-scratch query. [[IndexStoreSpec]] pins probe
  * ≡ one-shot [[graft.queries.SearchQueries.bm25]] bit-for-bit (same
  * expression tree, same integer inputs) after builds, appends,
  * deletions, and compaction.
  *
  * **CDC-driven maintenance** ([[syncFromLeaf]]): the index subscribes
  * to a manifest leaf's [[graft.compact.ChangeFeed]] — appended rows
  * become a generation's additions, removed rows its tombstones, and a
  * PURE COMPACTION of the leaf (walk-verified net-zero) advances the
  * cursor with zero index work. The cursor seals atomically with the
  * generation, so a crashed sync replays from the same cursor and
  * lands on the same seal — at-least-once safe without tags.
  *
  * Contract: `append` batches carry NEW doc_ids (the ingest pipeline
  * dedups upstream — re-appending a LIVE doc would double its
  * postings; re-adding a TOMBSTONED doc is the supported update shape).
  * `compact` folds generations offline, like the sibling stores.
  */
object IndexStore {

  /** Term-hash partitions per generation. 16 keeps fixture dirs small;
    * at corpus scale this is a dial — probes read |query-term buckets|
    * partitions per generation regardless of corpus size.
    */
  val Buckets = 16

  private val Ptr = graft.compact.VersionedPointer.Current

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest sealed generation, if any. */
  def currentSeq(spark: SparkSession, path: String): Option[Long] =
    Ptr.resolve(fsOf(spark, path), path)

  /** The bucket the Spark-side `pmod(xxhash64(word), Buckets)` assigns
    * — computed driver-side for the probe's static partition filter
    * (xxhash64's SQL seed is 42).
    */
  private[graft] def bucketOf(term: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L,
    )
    ((h % Buckets) + Buckets) % Buckets
  }

  private def readStats(spark: SparkSession, path: String, seq: Long): (Long, Long) = {
    val fs = fsOf(spark, path)
    val in = fs.open(new Path(s"$path/stats-$seq"))
    val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val Array(n, s) = text.trim.split(" ")
    (n.toLong, s.toLong)
  }

  /** Seal one generation: additions (postings + lengths), tombstones,
    * net stats, optional cursor — pointer LAST.
    */
  private def writeGeneration(
      spark: SparkSession,
      docs: Option[DataFrame],
      removed: Option[DataFrame],
      path: String,
      seq: Long,
      prevStats: (Long, Long),
      cursor: Option[String] = None,
  ): Long = {
    val fs = fsOf(spark, path)
    // Pre-redo debris sweep (the ClusterRepStore.update discipline): a
    // crashed UNSEALED attempt at this seq may have left add-/dl-/del-/
    // cursor-<seq> dirs behind, and seqDirs resolves by EXISTENCE — if
    // this retry's re-derived delta no longer carries a side (e.g. the
    // ChangeSet now has no removals), the stale dir would be sealed
    // into the generation, resurrecting ghost postings absent from
    // stats-<seq>. Delete unconditionally so the sealed generation
    // contains exactly what THIS attempt computed.
    Seq(s"add-$seq", s"dl-$seq", s"del-$seq", s"cursor-$seq").foreach { n =>
      try { fs.delete(new Path(s"$path/$n"), true); () } catch { case _: Throwable => () }
    }
    val (an, as) = docs.map { d =>
      val words = d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      words.groupBy("doc_id", "word")
        .agg(count(lit(1)).as("tf"))
        .withColumn("tb", pmod(xxhash64(col("word")), lit(Buckets)))
        .write.partitionBy("tb").mode("overwrite").parquet(s"$path/add-$seq")
      val dl = d.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
      dl.write.mode("overwrite").parquet(s"$path/dl-$seq")
      // coalesce: a netted feed window can legitimately carry ZERO
      // additions or removals (everything asserted was also retracted),
      // and sum() over an empty frame is NULL, not 0
      val b = dl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
      (b.getLong(0), b.getLong(1))
    }.getOrElse((0L, 0L))
    val (rn, rs) = removed.map { r =>
      val rdl = r.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
      rdl.write.mode("overwrite").parquet(s"$path/del-$seq")
      val b = rdl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head
      (b.getLong(0), b.getLong(1))
    }.getOrElse((0L, 0L))
    val (n, s) = (prevStats._1 + an - rn, prevStats._2 + as - rs)
    val out = fs.create(new Path(s"$path/stats-$seq"), true)
    try out.write(s"$n $s".getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    cursor.foreach { c =>
      val co = fs.create(new Path(s"$path/cursor-$seq"), true)
      try co.write(c.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally co.close()
    }
    Ptr.seal(fs, path, seq)
    seq
  }

  /** Build a fresh index over `docs` (seq 1). */
  def build(spark: SparkSession, docs: DataFrame, path: String): Long = {
    require(currentSeq(spark, path).isEmpty, s"index already sealed at $path — use append")
    writeGeneration(spark, Some(docs), None, path, 1L, (0L, 0L))
  }

  /** Append a batch of NEW documents as the next sealed generation —
    * work proportional to the batch; no existing generation is read or
    * rewritten (the add-log trick: arrival-only generations compose by
    * union, removals by tombstone).
    */
  def append(spark: SparkSession, docs: DataFrame, path: String): Long = {
    val cur = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed index at $path — build first"))
    writeGeneration(spark, Some(docs), None, path, cur + 1L, readStats(spark, path, cur))
  }

  /** One sealed generation carrying additions AND/OR removals (both
    * `(doc_id, text)` frames — tombstones need the text only for its
    * length). Bootstraps an empty index when nothing is sealed yet.
    */
  def applyDelta(
      spark: SparkSession,
      path: String,
      added: Option[DataFrame],
      removed: Option[DataFrame],
      cursor: Option[String] = None,
  ): Long = {
    val cur = currentSeq(spark, path)
    val prev = cur.map(readStats(spark, path, _)).getOrElse((0L, 0L))
    writeGeneration(spark, added, removed, path, cur.getOrElse(0L) + 1L, prev, cursor)
  }

  private def seqDirs(spark: SparkSession, path: String, seq: Long, prefix: String): Seq[(String, Long)] = {
    val fs = fsOf(spark, path)
    (1L to seq).map(i => (s"$path/$prefix-$i", i)).filter { case (p, _) => fs.exists(new Path(p)) }
  }

  /** Live generation count — [[StoreMaintenance.maintainIndex]]'s
    * compaction dial (probe fan-out is one scan per add/del dir).
    */
  def generationCount(spark: SparkSession, path: String): Int =
    currentSeq(spark, path)
      .map(s => seqDirs(spark, path, s, "add").size + seqDirs(spark, path, s, "del").size)
      .getOrElse(0)

  /** Union the tombstones as (t_id, dseq), if any exist. */
  private def tombstones(spark: SparkSession, path: String, seq: Long): Option[DataFrame] =
    seqDirs(spark, path, seq, "del")
      .map { case (p, i) => spark.read.parquet(p).select(col("doc_id").as("t_id"), lit(i).as("dseq")) }
      .reduceOption(_ unionByName _)

  /** Kill every row whose doc carries a LATER tombstone (re-adds after
    * a removal survive — `dseq > gseq` scopes the kill to the dead
    * edition). Tombstones are churn-bounded, so the anti-join
    * broadcasts them.
    */
  private def dropTombstoned(rows: DataFrame, tomb: Option[DataFrame]): DataFrame =
    tomb match {
      case None => rows.drop("gseq")
      case Some(t) =>
        rows.join(broadcast(t), rows("doc_id") === t("t_id") && t("dseq") > rows("gseq"), "left_anti")
          .drop("gseq")
    }

  /** BM25 over the sealed index for `terms`: reads ONLY the terms'
    * `tb=` partitions of each generation (static partition filter),
    * derives per-term df from the probed postings (complete per term
    * by construction, tombstoned docs excluded), and scores with the
    * exact expression tree of the one-shot
    * [[graft.queries.SearchQueries.bm25]] — byte-equal results on the
    * same corpus.
    */
  def search(
      spark: SparkSession,
      path: String,
      terms: Seq[String],
      withDl: Boolean = false, // keep the doc-length column (rerank stages need it)
  ): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val seq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed index at $path"))
    val (nDocs, sumDl) = readStats(spark, path, seq)
    val tbs = terms.map(bucketOf).distinct
    val tomb = tombstones(spark, path, seq)
    val postings = dropTombstoned(
      seqDirs(spark, path, seq, "add")
        .map { case (p, i) =>
          spark.read.parquet(p).where(col("tb").isin(tbs: _*)).withColumn("gseq", lit(i))
        }
        .reduce(_ unionByName _)
        .where(col("word").isin(terms: _*)),
      tomb,
    )
    val n = terms.size
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("word") === t, col("tf"))), lit(0L)).as(s"tf${i + 1}")
    }
    val cand = postings.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val dl = dropTombstoned(
      seqDirs(spark, path, seq, "dl")
        .map { case (p, i) => spark.read.parquet(p).withColumn("gseq", lit(i)) }
        .reduce(_ unionByName _),
      tomb,
    )
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("word") === t, 1)).cast("double").as(s"df${i + 1}")
    }
    val g = postings.agg(dfCols.head, dfCols.tail: _*)
      .withColumn("n", lit(nDocs).cast("double"))
      .withColumn("avgdl", lit(sumDl).cast("double") / lit(nDocs).cast("double"))
    val score = (1 to n)
      .map(i => expr(graft.queries.SearchQueries.contribSql(s"tf$i", s"df$i")))
      .reduce(_ + _)
    val outCols = (col("doc_id") +:
      (1 to n).map(i => col(s"tf$i").cast("int").as(s"tf$i")) :+
      round(score, 6).as("bm25")) ++ (if (withDl) Seq(col("dl")) else Seq.empty)
    cand.join(dl, "doc_id")
      .crossJoin(broadcast(g))
      .select(outCols: _*)
      .orderBy(desc("bm25"), col("doc_id"))
  }

  private def readCursor(spark: SparkSession, path: String, seq: Long): Option[graft.compact.ChangeFeed.Cursor] = {
    val fs = fsOf(spark, path)
    val p = new Path(s"$path/cursor-$seq")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val lines = text.split("\n").toSeq
      Some(graft.compact.ChangeFeed.Cursor(lines.head.trim.toLong, lines.tail.filter(_.nonEmpty).toSet))
    }
  }

  private def serializeCursor(c: graft.compact.ChangeFeed.Cursor): String =
    (c.seq.toString +: c.counted.toSeq.sorted).mkString("\n")

  /** The sealed feed cursor of a [[syncFromLeaf]]-maintained index —
    * None for an index built by hand (or not yet built). The shared
    * lifecycle tick ([[graft.compact.SyncTick]]) reads it to compute
    * ONE window for every subscribed consumer.
    */
  def feedCursor(spark: SparkSession, path: String): Option[graft.compact.ChangeFeed.Cursor] =
    currentSeq(spark, path).flatMap(readCursor(spark, path, _))

  /** Net a window's (added, removed) row bags against each other
    * before sealing. A multi-commit window can assert and retract the
    * SAME edition of a doc (appended then deleted — prior state never
    * held it; or a compaction's identical remove+add — prior state
    * keeps it): sealing both in one generation would let the
    * same-generation add win the `dseq > gseq` tie and serve a doc the
    * window net-removed. Bag subtraction of IDENTICAL rows resolves
    * both cases exactly — identical text contributes identical
    * postings, so a netted pair is a no-op on the index either way,
    * while a genuinely re-worded edition (different text) still
    * tombstones + re-adds.
    */
  private def netDelta(
      added: Option[DataFrame],
      removed: Option[DataFrame],
  ): (Option[DataFrame], Option[DataFrame]) = (added, removed) match {
    case (Some(a), Some(r)) =>
      // align by UNION-with-null-fill, not a strict shared select: each
      // side merges ITS OWN files' schemas, so mid-evolution the same
      // logical row can arrive with different column sets — a strict
      // select would throw on every poll and wedge the consumer. A
      // null-filled column nets exactly when the visible content
      // matches, which is the only thing postings derive from.
      val types = (a.schema ++ r.schema).map(f => f.name -> f.dataType).toMap
      val allCols = types.keys.toSeq.sorted
      def align(df: DataFrame) = df.select(allCols.map { n =>
        if (df.columns.contains(n)) col(n).cast(types(n)).as(n)
        else lit(null).cast(types(n)).as(n)
      }: _*)
      // persist the netted frames: the emptiness probe AND the
      // generation writes both consume them — unpinned, each exceptAll
      // would evaluate twice (and re-read the window's files with it).
      // Callers unpersist after the generation seals.
      def nonEmptyOpt(df: DataFrame): Option[DataFrame] = {
        val p = df.persist()
        if (p.isEmpty) { p.unpersist(); None } else Some(p)
      }
      val (as, rs) = (align(a), align(r))
      (nonEmptyOpt(as.exceptAll(rs)), nonEmptyOpt(rs.exceptAll(as)))
    case other => other
  }

  /** Seal one generation from an externally-computed change window —
    * the [[graft.compact.SyncTick]] entry: `added`/`removed` are the
    * window's asserted/retracted `(doc_id, text)` rows (the caller
    * materialized them once for every consumer), and the cursor seals
    * from `ch.next` exactly as [[syncFromLeaf]] would.
    */
  private[graft] def applyChanges(
      spark: SparkSession,
      path: String,
      ch: graft.compact.ChangeFeed.ChangeSet,
      added: Option[DataFrame],
      removed: Option[DataFrame],
  ): Long = {
    val (a, r) = netDelta(added, removed)
    try applyDelta(spark, path, a, r, cursor = Some(serializeCursor(ch.next)))
    finally Seq(a, r).flatten.foreach { df => df.unpersist(); () }
  }

  /** Advance the index to `leaf`'s head through the commit-log change
    * feed — the CDC consumer composition: appended rows become this
    * generation's additions, removed rows its tombstones, and a
    * walk-verified PURE COMPACTION of the leaf advances the cursor
    * with ZERO data read on either side (IndexStoreSpec proves it over
    * deliberately corrupted leaf bytes). The cursor seals atomically
    * with the generation, so an at-least-once re-drive replays from
    * the same cursor and lands on the same seal. Returns the feed mode
    * applied ("noop" | "walk" | "diff"). Run the leaf with
    * `retainSuperseded` spanning the sync lag — [[ChangeFeed
    * .readRemoved]] fails loudly on GC'd retractions rather than
    * under-deleting.
    */
  def syncFromLeaf(spark: SparkSession, leaf: String, path: String): String = {
    import graft.compact.ChangeFeed
    val cur = currentSeq(spark, path)
    val cursor = cur match {
      case None => ChangeFeed.Cursor.initial
      case Some(s) => readCursor(spark, path, s).getOrElse(
        throw new IllegalStateException(
          s"index at $path has no cursor for generation $s — it was not built by syncFromLeaf; " +
            "bootstrap a fresh path instead of mixing manual appends with feed sync"),
      )
    }
    val ch = ChangeFeed.changesSince(spark, leaf, cursor)
    if (ch.mode == "noop") return "noop"
    // merge-on-read sidecar terms compose with the file terms exactly
    // like a compaction's remove+add of the same doc: additions and
    // tombstones sealed in ONE generation, `dseq > gseq` scoping the
    // kill to the dead edition — so ⊕appended ⊕restored ⊖removed
    // ⊖deleted folds to the leaf's true row delta
    // allowMissingColumns: each term merges its own files' schemas, so
    // a mid-evolution window can union differently-shaped frames
    def unionOpt(parts: Seq[Option[DataFrame]]): Option[DataFrame] =
      parts.flatten.reduceOption(_.unionByName(_, allowMissingColumns = true))
    val added = unionOpt(Seq(
      if (ch.appended.isEmpty) None
      else Some(ChangeFeed.readAppended(spark, ch).drop("_change_file")),
      if (ch.restored.isEmpty) None
      else Some(ChangeFeed.readRestored(spark, leaf, ch).drop("_change_file")),
    ))
    val removed = unionOpt(Seq(
      if (ch.removed.isEmpty) None
      else Some(ChangeFeed.readRemoved(spark, ch).drop("_change_file")),
      if (ch.deleted.isEmpty) None
      else Some(ChangeFeed.readDeleted(spark, leaf, ch).drop("_change_file")),
    ))
    // identical assert+retract pairs inside ONE window net out (see
    // netDelta — the appended-then-deleted edition must not survive
    // the same-generation tie)
    val (a, r) = netDelta(added, removed)
    try applyDelta(spark, path, a, r, cursor = Some(serializeCursor(ch.next)))
    finally Seq(a, r).flatten.foreach { df => df.unpersist(); () }
    ch.mode
  }

  /** Fold every generation's postings/lengths into ONE new sealed
    * generation — tombstoned rows dropped PHYSICALLY and the
    * tombstones cleared, probe cost back to one dir per bucket — then
    * reclaim the superseded dirs. The newest cursor carries forward.
    * Offline-only, like the sibling stores' compaction: readers
    * mid-probe on the old generations lose their dirs at the reclaim.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val seq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed index at $path"))
    val adds = seqDirs(spark, path, seq, "add")
    val dels = seqDirs(spark, path, seq, "del")
    if (adds.size <= 1 && dels.isEmpty) return seq
    val fs = fsOf(spark, path)
    val next = seq + 1L
    val tomb = tombstones(spark, path, seq)
    dropTombstoned(
      adds.map { case (p, i) => spark.read.parquet(p).withColumn("gseq", lit(i)) }
        .reduce(_ unionByName _),
      tomb,
    ).write.partitionBy("tb").mode("overwrite").parquet(s"$path/add-$next")
    dropTombstoned(
      seqDirs(spark, path, seq, "dl")
        .map { case (p, i) => spark.read.parquet(p).withColumn("gseq", lit(i)) }
        .reduce(_ unionByName _),
      tomb,
    ).write.mode("overwrite").parquet(s"$path/dl-$next")
    val (nDocs, sumDl) = readStats(spark, path, seq)
    val out = fs.create(new Path(s"$path/stats-$next"), true)
    try out.write(s"$nDocs $sumDl".getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    readCursor(spark, path, seq).foreach { c =>
      val co = fs.create(new Path(s"$path/cursor-$next"), true)
      try co.write(serializeCursor(c).getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally co.close()
    }
    Ptr.seal(fs, path, next)
    (1L to seq).foreach { i =>
      Seq(s"add-$i", s"dl-$i", s"del-$i", s"stats-$i", s"cursor-$i", s"_current-$i").foreach { ndir =>
        try { fs.delete(new Path(s"$path/$ndir"), true); () } catch { case _: Throwable => () }
      }
    }
    next
  }
}
