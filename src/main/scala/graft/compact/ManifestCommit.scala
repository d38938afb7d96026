package graft.compact

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Object-store-safe commit: the COMMIT path performs no renames.
  *
  * The rename-mode commit ([[Merger]]) assumes `rename` is atomic; real
  * object stores implement it as copy+delete (s3a: non-atomic, O(bytes)).
  * Here the merge output is written once into a hidden `.data-<runId>/`
  * directory under the leaf (via the session's configured job committer —
  * on s3a that should be a PUT-based committer such as the magic
  * committer, keeping the whole pipeline rename-free), and the commit
  * point is the creation of one small `_manifest-<stem>-<runId>.json`
  * object in the leaf — a single-object PUT, which object stores make
  * atomic — naming the input files it supersedes and the output files it
  * adds.
  *
  * Reader contract: the live file set of a leaf is
  * `visible *.parquet − union(inputs of sealed manifests) +
  * union(outputs of sealed manifests)` ([[liveFiles]] / [[readLeaf]]).
  * Crash matrix:
  *
  *   - before/during the data write: debris under `.data-*` only —
  *     hidden from plain listings, Planner, and [[liveFiles]];
  *     reclaimed by [[gcOrphans]].
  *   - during the manifest PUT (torn upload): the file fails the
  *     `"sealed":true}` terminator check and is ignored — readers still
  *     see the originals; debris as above.
  *   - after publish, during original-file GC: the manifest already
  *     excludes the originals from the live set, so a reader through
  *     [[liveFiles]] NEVER sees duplicates — leftover originals are
  *     storage debris, not a correctness hazard (the rename-mode commit
  *     cannot make this promise).
  *
  * The manifest names only files relative to its own leaf, so leaves
  * stay independently movable; later compactions of a manifest-committed
  * leaf list their inputs through [[liveFiles]] and may supersede
  * `.data-*` members in turn (the subtraction is by relative path).
  */
object ManifestCommit {

  private val sealMark = "\"sealed\":true}"

  /** Merge one plan and commit via manifest publish. Mirrors
    * [[Merger.mergeAndCommit]]'s validate-before-commit discipline; only
    * the commit mechanism differs.
    */
  def mergeAndCommit(spark: SparkSession, plan: LeafPlan, cfg: CompactorConfig): LeafResult = {
    val runId = UUID.randomUUID().toString.replace("-", "")
    val dataDir = s"${plan.leaf}/.data-$runId"
    try {
      val fs = FileIndexer.fsFor(spark, plan.leaf)
      val rowsIn = Merger.footerRows(spark, plan.files)

      val df = spark.read
        .option("mergeSchema", "true")
        .parquet(plan.files: _*)
      Merger.sizeForOutput(df, plan.totalBytes, rowsIn, cfg)
        .write
        .option("compression", "snappy")
        .option("maxRecordsPerFile", cfg.maxRowsPerFile)
        .parquet(dataDir)

      val outFiles = fs
        .listStatus(new Path(dataDir))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
        .sortBy(_.getName)
        .toSeq
      val rowsStaged = Merger.footerRows(spark, outFiles.map(_.toString))
      if (rowsStaged != rowsIn) {
        fs.delete(new Path(dataDir), true)
        return LeafResult(
          plan.leaf, plan.stem, success = false, rowsStaged, 0,
          Some(s"validation failed: staged $rowsStaged rows != input $rowsIn"),
        )
      }

      // COMMIT POINT: one PUT of the sealed manifest. Everything before
      // this line is invisible; everything after is garbage collection.
      val inputsRel = plan.files.map(relativeTo(plan.leaf, _))
      val outputsRel = outFiles.map(p => s".data-$runId/${p.getName}")
      publish(fs, plan.leaf, plan.stem, runId, inputsRel, outputsRel, rowsStaged)

      // GC the superseded originals. Best-effort BY DESIGN: the manifest
      // already subtracts them from the live set, so a failed delete is
      // surfaced as debris, never as duplicate rows. With
      // cfg.retainSuperseded they are kept deliberately — the time-travel
      // retention mode ([[readLeafAt]] needs them to reconstruct earlier
      // snapshots).
      val undeleted =
        if (cfg.retainSuperseded) Seq.empty
        else plan.files.filterNot { p =>
          try fs.delete(new Path(p), false)
          catch { case _: Throwable => false }
        }
      LeafResult(
        plan.leaf, plan.stem, success = true, rowsStaged, outFiles.size,
        if (undeleted.isEmpty) None
        else Some(
          s"committed; ${undeleted.size} superseded original(s) not deleted " +
            s"(excluded from the live set by the manifest — debris, not duplicates): ${undeleted.mkString(", ")}",
        ),
      )
    } catch {
      case e: Throwable =>
        // Rollback order matters: a torn-or-even-complete manifest (e.g.
        // close() threw after a full write) must go BEFORE the data dir —
        // a sealed manifest naming deleted outputs would break readers.
        // If the manifest can't be removed, leave the data dir intact so
        // the (manifest, data) pair stays consistent.
        val fsR = try Some(FileIndexer.fsFor(spark, plan.leaf)) catch { case _: Throwable => None }
        val manifestGone = fsR.exists { f =>
          val mp = new Path(s"${plan.leaf}/_manifest-${plan.stem}-$runId.json")
          try { f.delete(mp, false); !f.exists(mp) }
          catch { case _: Throwable => false }
        }
        if (manifestGone) {
          try fsR.foreach(_.delete(new Path(dataDir), true))
          catch { case _: Throwable => () }
        }
        LeafResult(plan.leaf, plan.stem, success = false, 0L, 0, Some(e.toString))
    }
  }

  /** The atomic publish: one create of the sealed manifest object.
    * Shared by the solo path above and [[BatchMerger]]'s manifest-mode
    * commit. Stamps a monotonic `seq` (1 + max over the leaf's sealed
    * manifests — one listing plus one small read per existing manifest,
    * metadata-only; O(commit-history length), the classic manifest-chain
    * growth cost that a snapshot-pointer object would amortize if leaf
    * histories ever got long) so the commit history is totally ordered
    * for [[manifestLog]]/[[readLeafAt]]; well-defined under the
    * documented single-writer-per-leaf assumption.
    */
  private[compact] def publish(
      fs: FileSystem,
      leaf: String,
      stem: String,
      runId: String,
      inputsRel: Seq[String],
      outputsRel: Seq[String],
      rows: Long,
  ): Unit = {
    val seq = 1L + sealedManifests(fs, leaf).map(_.seq).foldLeft(0L)(math.max)
    val manifestPath = new Path(s"$leaf/_manifest-$stem-$runId.json")
    val json =
      s"""{"runId":"$runId","stem":"$stem","rows":$rows,"seq":$seq,""" +
        s""""inputs":${jsonArray(inputsRel)},"outputs":${jsonArray(outputsRel)},""" +
        sealMark
    val out = fs.create(manifestPath, false)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Parsed manifest. `seq` orders the commit history (0 for manifests
    * sealed before the field existed — legacy reads keep working, they
    * just sort before every stamped commit).
    */
  private[compact] final case class Manifest(
      inputs: Seq[String],
      outputs: Seq[String],
      seq: Long = 0L,
      runId: String = "",
      stem: String = "",
      rows: Long = 0L,
  )

  /** Read + parse one manifest; None if torn/garbled (a partial upload
    * never carries the trailing seal mark, and any parse failure is
    * treated as "this manifest does not exist").
    */
  private[compact] def readManifest(fs: FileSystem, p: Path): Option[Manifest] = {
    val text =
      try {
        val in = fs.open(p)
        try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
      } catch { case _: Throwable => return None }
    if (!text.endsWith(sealMark)) return None
    def arr(field: String): Option[Seq[String]] = {
      val m = s""""$field":\\[([^\\]]*)\\]""".r.findFirstMatchIn(text).map(_.group(1))
      m.map { body =>
        if (body.trim.isEmpty) Seq.empty
        else body.split(',').toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
      }
    }
    def num(field: String): Long =
      s""""$field":(\\d+)""".r.findFirstMatchIn(text).map(_.group(1).toLong).getOrElse(0L)
    def str(field: String): String =
      s""""$field":"([^"]*)"""".r.findFirstMatchIn(text).map(_.group(1)).getOrElse("")
    for (ins <- arr("inputs"); outs <- arr("outputs"))
      yield Manifest(ins, outs, num("seq"), str("runId"), str("stem"), num("rows"))
  }

  /** All sealed manifests of a leaf (unordered). */
  private[compact] def sealedManifests(fs: FileSystem, leaf: String): Seq[Manifest] = {
    val leafPath = new Path(leaf)
    if (!fs.exists(leafPath)) return Seq.empty
    fs.listStatus(leafPath)
      .filter(e => e.isFile && e.getPath.getName.startsWith("_manifest-") && e.getPath.getName.endsWith(".json"))
      .flatMap(e => readManifest(fs, e.getPath))
      .toSeq
  }

  /** The leaf's commit history, oldest first — the snapshot log a
    * table-format reader would expose (seq, runId, stem, rows per
    * commit). Metadata-only: one listing + one small read per manifest.
    */
  def manifestLog(spark: SparkSession, leaf: String): Seq[Manifest] =
    sealedManifests(FileIndexer.fsFor(spark, leaf), leaf).sortBy(m => (m.seq, m.runId))

  /** The live parquet set of a leaf under manifest semantics: visible
    * files minus superseded inputs plus manifest outputs. One listing of
    * the leaf + one small read per manifest — O(manifests) metadata ops,
    * no data I/O.
    */
  def liveFiles(spark: SparkSession, leaf: String): Seq[String] =
    liveFilesAt(spark, leaf, Long.MaxValue)

  /** [[liveFiles]] as of commit `asOfSeq` (inclusive): only manifests
    * with `seq <= asOfSeq` participate, so the result is the live set
    * right after that commit — snapshot time travel over the manifest
    * log. Exact while the later commits' superseded inputs still exist:
    * run with `CompactorConfig.retainSuperseded` (and a deferred GC) to
    * keep history readable; after GC, as-of reads older than the
    * reclaimed inputs fail on missing files rather than silently
    * returning partial data. Raw files that ARRIVED after the as-of
    * commit are not versioned (a lake leaf has no arrival log) — as-of
    * governs compaction commits, not ingestion.
    */
  def liveFilesAt(spark: SparkSession, leaf: String, asOfSeq: Long): Seq[String] = {
    val fs = FileIndexer.fsFor(spark, leaf)
    val leafPath = new Path(leaf)
    if (!fs.exists(leafPath)) return Seq.empty
    val entries = fs.listStatus(leafPath)
    val (upTo, later) = entries
      .filter(e => e.isFile && e.getPath.getName.startsWith("_manifest-") && e.getPath.getName.endsWith(".json"))
      .flatMap(e => readManifest(fs, e.getPath))
      .partition(_.seq <= asOfSeq)
    val superseded = upTo.flatMap(_.inputs).toSet
    val visibleNow = entries
      .filter { e =>
        val n = e.getPath.getName
        e.isFile && n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_")
      }
      .map(_.getPath.getName)
      .toSeq
    // Raw files compacted by LATER commits were visible at asOf; take
    // them from those manifests' inputs, not the current listing, so an
    // expired (deleted) one still lands in the resolved list and the
    // read fails loudly (PATH_NOT_FOUND) instead of silently shrinking
    // the snapshot. `.data-*` inputs of later commits are outputs of
    // commits ≤ asOf and arrive via the outputs union below — or belong
    // to commits > asOf and must not appear — so only raw names
    // reconstruct here.
    val visibleAtAsOf = (visibleNow ++ later.flatMap(_.inputs).filterNot(_.startsWith(".data-"))).distinct
    val live = (visibleAtAsOf.filterNot(superseded) ++
      upTo.flatMap(_.outputs).filterNot(superseded)).distinct
    live.sorted.map(rel => s"$leaf/$rel")
  }

  /** The leaf as a DataFrame, resolved through its manifests. */
  def readLeaf(spark: SparkSession, leaf: String): DataFrame =
    readLeafAt(spark, leaf, Long.MaxValue)

  /** The leaf as of commit `asOfSeq` — see [[liveFilesAt]]. */
  def readLeafAt(spark: SparkSession, leaf: String, asOfSeq: Long): DataFrame = {
    val files = liveFilesAt(spark, leaf, asOfSeq)
    if (files.isEmpty) spark.emptyDataFrame
    else spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Retire history: delete the still-present superseded inputs of every
    * manifest with `seq <= beforeSeq` (the files only as-of reads OLDER
    * than those commits need). Snapshots at or after `beforeSeq` stay
    * exact; earlier ones become unreadable — the expire-snapshots
    * lifecycle step that bounds `retainSuperseded`'s storage. Returns
    * files removed. Metadata ops + deletes only, no data I/O.
    */
  def expireSnapshots(spark: SparkSession, leaf: String, beforeSeq: Long): Int = {
    val fs = FileIndexer.fsFor(spark, leaf)
    val manifests = sealedManifests(fs, leaf)
    val stillLive = liveFiles(spark, leaf).map(relativeTo(leaf, _)).toSet
    val expirable = manifests.filter(_.seq <= beforeSeq).flatMap(_.inputs).distinct
      .filterNot(stillLive) // a live file is never history, whatever names it
    expirable.count { rel =>
      val p = new Path(s"$leaf/$rel")
      try fs.exists(p) && fs.delete(p, false)
      catch { case _: Throwable => false }
    }
  }

  /** Reclaim `.data-*` dirs no sealed manifest references — debris from
    * runs that died before their commit point. Returns dirs removed.
    */
  def gcOrphans(spark: SparkSession, leaf: String): Int = {
    val fs = FileIndexer.fsFor(spark, leaf)
    val leafPath = new Path(leaf)
    if (!fs.exists(leafPath)) return 0
    val entries = fs.listStatus(leafPath)
    val referenced = entries
      .filter(e => e.isFile && e.getPath.getName.startsWith("_manifest-") && e.getPath.getName.endsWith(".json"))
      .flatMap(e => readManifest(fs, e.getPath))
      .flatMap(_.outputs)
      .map(_.takeWhile(_ != '/'))
      .toSet
    val orphans = entries.filter { e =>
      e.isDirectory && e.getPath.getName.startsWith(".data-") && !referenced.contains(e.getPath.getName)
    }
    orphans.count(o => fs.delete(o.getPath, true))
  }

  private[compact] def relativeTo(leaf: String, path: String): String = {
    val pfx = if (leaf.endsWith("/")) leaf else leaf + "/"
    require(path.startsWith(pfx), s"input $path is not under leaf $leaf")
    path.stripPrefix(pfx)
  }

  private def jsonArray(xs: Seq[String]): String = {
    // '"'/'\\' would need escaping; ']'/',' would break the regex-based
    // array parse in readManifest (truncated or mis-split lists — a
    // WRONG live set, far worse than a refused commit). Reject all four:
    // the format stays bijective for every name it accepts, and real
    // lake file names never contain them.
    xs.foreach(x =>
      require(!x.exists(c => c == '"' || c == '\\' || c == ']' || c == ','), s"unencodable file name: $x"),
    )
    xs.map("\"" + _ + "\"").mkString("[", ",", "]")
  }
}
