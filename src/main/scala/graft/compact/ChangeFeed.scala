package graft.compact

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The commit log as a PUBLIC incremental-read surface — table-format
  * CDC over a manifest leaf (the Iceberg "incremental scan" / Delta
  * "change data feed" shape, grown from [[MaterializedAgg]]'s private
  * commit-window walk).
  *
  * A consumer holds a [[ChangeFeed.Cursor]] — the head seq it has
  * processed plus the exact file set its state counts (the same ledger
  * discipline [[MaterializedAgg]] persists; file NAMES, not data — the
  * cursor is metadata-sized and survives any GC). Each poll returns a
  * [[ChangeFeed.ChangeSet]]: two file sets, `appended` (rows that
  * entered the live set) and `removed` (rows that left it), plus the
  * fidelity the log could prove:
  *
  *  - `mode = "walk"`: the commit window was complete and every rewrite
  *    in it classified against the producer ledger (a commit's sealed
  *    row count vs the metadata-only Σ rows of its inputs). The sets
  *    are NET ROW CHANGES: a verified row-preserving rewrite (pure
  *    compaction) contributes NOTHING — a consumer folding
  *    `⊕ appended ⊖ removed` reads zero bytes across compaction churn.
  *  - `mode = "diff"`: the window couldn't be walked (a checkpoint
  *    folded manifests inside it, an expire retired one, a producer and
  *    its file both gone, or raw arrivals bypassed the commit log). The
  *    sets degrade to the file-level diff between the cursor's counted
  *    set and the live set — still EXACT as a retraction feed
  *    (`⊕ appended ⊖ removed` remains the true delta), but compaction
  *    now shows up as remove+add of the same rows, so the consumer pays
  *    a re-read it didn't need.
  *
  * Both modes are metadata-only to compute: the walk reads manifests
  * (plus parquet FOOTERS for files whose producer set is incomplete);
  * the diff reads one listing. No data I/O until [[readAppended]] /
  * [[readRemoved]].
  *
  * Raw arrivals (files dropped beside the leaf without a commit) have no
  * seq, so a window containing one cannot be walked — it degrades to
  * diff, which reports the arrival exactly. Gate ingestion through a
  * manifest append ([[WapCommit.writeAuditPublish]], or
  * [[ManifestCommit]] commits generally) and every window walks.
  *
  * At 100 TB this is the difference between an incremental consumer
  * (downstream index ingest, replication, a cache refresh, a streaming
  * materialized aggregate) scaling with ITS OWN lag versus with the
  * table: O(commits-behind) metadata + the net changed bytes, never a
  * full-table scan.
  */
object ChangeFeed {

  /** A consumer's resume point: `seq` = last processed head,
    * `counted` = the exact live set the consumer's state reflects
    * (absolute paths — data files AND merge-on-read delete sidecars,
    * since both carry row-change state). [[Cursor.initial]] starts
    * before everything.
    */
  final case class Cursor(seq: Long, counted: Set[String])

  object Cursor {
    val initial: Cursor = Cursor(0L, Set.empty)

    /** A cursor adopting the leaf's CURRENT state — for consumers that
      * bootstrap with a full read and then go incremental.
      */
    def atHead(spark: SparkSession, leaf: String): Cursor =
      Cursor(
        ManifestCommit.currentSeq(spark, leaf),
        (ManifestCommit.liveFiles(spark, leaf) ++ ManifestCommit.liveDeletes(spark, leaf)).toSet,
      )
  }

  /** One consumable window. All four change lists are absolute file
    * paths; [[next]] is the cursor to persist AFTER folding the window.
    * `appended`/`removed` are DATA files read whole; `deleted` /
    * `restored` are merge-on-read delete SIDECARS whose addressed rows
    * leave (⊖) or re-assert (⊕) — read them through [[readDeleted]] /
    * [[readRestored]], never as data. A restored sidecar always rides
    * with its targets' whole-file removal in the same window (a sidecar
    * is only ever consumed by a commit that supersedes its targets), so
    * the four-term fold `⊕ appended ⊖ removed ⊖ deleted ⊕ restored`
    * stays the exact net row delta in both modes.
    */
  final case class ChangeSet(
      mode: String, // "walk" | "diff" | "noop"
      appended: Seq[String],
      removed: Seq[String],
      next: Cursor,
      deleted: Seq[String] = Seq.empty,
      restored: Seq[String] = Seq.empty,
  ) {
    def isEmpty: Boolean =
      appended.isEmpty && removed.isEmpty && deleted.isEmpty && restored.isEmpty
  }

  /** Everything between `cursor` and the current head. */
  def changesSince(spark: SparkSession, leaf: String, cursor: Cursor): ChangeSet = {
    val toSeq = ManifestCommit.currentSeq(spark, leaf)
    val live = ManifestCommit.liveFiles(spark, leaf)
    val liveDel = ManifestCommit.liveDeletes(spark, leaf)
    val liveSet = live.toSet ++ liveDel
    if (toSeq == cursor.seq && liveSet == cursor.counted)
      return ChangeSet("noop", Seq.empty, Seq.empty, cursor)
    val fs = FileIndexer.fsFor(spark, leaf)
    val fullLog = ManifestCommit.manifestLog(spark, leaf)
    val walked =
      if (toSeq <= cursor.seq) None // head moved backwards only via expire/checkpoint → diff
      else
        ManifestCommit
          .changelogOf(fullLog, cursor.seq, toSeq)
          .flatMap(MaterializedAgg.walkDeltas(spark, fs, leaf, fullLog, _, cursor.counted, liveSet))
          // a walked append can already be superseded-and-GC'd by a
          // later commit INSIDE the window (default non-retaining
          // config): its rows are the window's genuine net change but
          // only the superseder's outputs still hold them. An
          // unreadable ChangeSet would wedge the consumer forever
          // (same poll, same throw) — degrade to the file-level diff,
          // which only names live files on the ⊕ side. The same guard
          // MaterializedAgg.refreshAll applies to its own walk.
          // Sidecar terms additionally need their TARGET files (and any
          // referenced equality-exclusion sidecars) on disk — the rows
          // resolve through position/key joins.
          .filter { w =>
            w.files.forall(p => fs.exists(new Path(p))) &&
              Seq(w.deleted, w.restored).forall(ManifestCommit.deleteRowsReadable(spark, leaf, _))
          }
    val nextCur = Cursor(toSeq, liveSet)
    walked match {
      case Some(w) => ChangeSet("walk", w.appended, w.removed, nextCur, w.deleted, w.restored)
      case None =>
        val addedAll = (liveSet -- cursor.counted).toSeq.sorted
        val removedAll = (cursor.counted -- liveSet).toSeq.sorted
        val (delNew, appData) = addedAll.partition(ManifestCommit.isDeletePath)
        val (delGone, remData) = removedAll.partition(ManifestCommit.isDeletePath)
        ChangeSet("diff", appData, remData, nextCur, deleted = delNew, restored = delGone)
    }
  }

  /** Seq-only convenience: resume from "right after commit `fromSeq`"
    * without a persisted file set. EXACT only when every file on the
    * leaf is commit-tracked — the counted set is reconstructed with
    * [[ManifestCommit.liveFilesAt]], whose arrival caveat applies (raw
    * files are unversioned and assumed pre-cursor). Consumers that can
    * persist 16 bytes should persist the [[Cursor]] instead.
    */
  def changesSinceSeq(spark: SparkSession, leaf: String, fromSeq: Long): ChangeSet =
    changesSince(
      spark, leaf,
      Cursor(
        fromSeq,
        (ManifestCommit.liveFilesAt(spark, leaf, fromSeq) ++
          ManifestCommit.liveDeletesAt(spark, leaf, fromSeq)).toSet,
      ),
    )

  /** The appended rows of a change set, stamped with `_change_file` (the
    * producing file — the natural idempotence key for a re-driven
    * consumer). Appended files are live at cursor-advance time, so this
    * read cannot miss; schema merges across the window's files.
    */
  def readAppended(spark: SparkSession, changes: ChangeSet): DataFrame =
    readFiles(spark, changes.appended)

  /** The removed rows — the ⊖ side. Removed files are by definition no
    * longer live; under the default GC they may already be reclaimed, in
    * which case this read fails LOUDLY (missing path) and the consumer
    * must rebuild — never silently under-retract. Run the leaf with
    * `CompactorConfig.retainSuperseded` + deferred
    * [[ManifestCommit.expireSnapshots]] to keep the retraction feed
    * readable for the consumer's maximum lag.
    */
  def readRemoved(spark: SparkSession, changes: ChangeSet): DataFrame = {
    val gone = changes.removed.filterNot { p =>
      FileIndexer.fsFor(spark, p).exists(new Path(p))
    }
    if (gone.nonEmpty)
      throw new java.io.IOException(
        s"retraction feed unreadable: ${gone.size} removed file(s) already GC'd " +
          s"(first: ${gone.head}) — consumer must rebuild from the live set, or the leaf " +
          "must retain superseded files for the consumer's lag (retainSuperseded + expireSnapshots)",
      )
    readFiles(spark, changes.removed)
  }

  /** The rows a window's `deleted` sidecars retract — the row-level
    * ⊖ side of a merge-on-read delete. `_change_file` names the SIDECAR
    * (the idempotence key), not the data file the row came from. Same
    * loud-failure retention contract as [[readRemoved]]: both the
    * sidecar and its target files must still be on disk.
    */
  def readDeleted(spark: SparkSession, leaf: String, changes: ChangeSet): DataFrame =
    readSidecarRows(spark, leaf, changes.deleted)

  /** The rows a window's `restored` sidecars re-assert (⊕) — a consumed
    * sidecar's retractions cancel against its targets' whole-file
    * removal in the same window.
    */
  def readRestored(spark: SparkSession, leaf: String, changes: ChangeSet): DataFrame =
    readSidecarRows(spark, leaf, changes.restored)

  private def readSidecarRows(spark: SparkSession, leaf: String, sidecars: Seq[String]): DataFrame =
    if (sidecars.isEmpty) spark.emptyDataFrame
    else ManifestCommit.readDeleteRows(spark, leaf, sidecars)
      .withColumnRenamed("_delete_file", "_change_file")

  private def readFiles(spark: SparkSession, files: Seq[String]): DataFrame =
    if (files.isEmpty) spark.emptyDataFrame
    else {
      import org.apache.spark.sql.functions.input_file_name
      spark.read
        .option("mergeSchema", "true")
        .parquet(files: _*)
        .withColumn("_change_file", input_file_name())
    }
}
