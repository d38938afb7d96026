package graft.compact

import java.util.UUID
import java.util.concurrent.Executors

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Many-tiny-leaf merge: N small output groups in ONE Spark job.
  *
  * The reference's daily reality is thousands of tiny leaves
  * (parquet_compactor.py:295-328 iterates them serially); the per-leaf
  * [[Merger]] keeps that shape — one scan job + one write job per group —
  * which at swarm scale is driver-bound on fixed job overhead, not I/O.
  * Here a batch of schema-homogeneous tiny plans becomes:
  *
  *   1. one multi-path scan of every input file, tagged with its plan's
  *      `__gid` (dense plan index) via a broadcast path→gid join,
  *   2. one `repartition(__gid)` + `partitionBy(__gid)` staged write —
  *      each group lands in its own `__gid=K/` subdir, WITHOUT the
  *      synthetic column (partitionBy keeps it out of the data files),
  *   3. per-plan validation (staged footer rows == input footer rows) and
  *      per-plan commit (rename to `{stem}_{32hex}.parquet`, delete
  *      originals) — exactly [[Merger]]'s invariants, still isolated per
  *      group: one failed validation skips only that plan.
  *
  * Plans whose input files disagree on footer schema (needs mergeSchema),
  * or that fail batch validation (e.g. a path the gid join couldn't tag),
  * fall back to the solo [[Merger]] — correctness never depends on the
  * batch path succeeding.
  */
object BatchMerger {

  private final case class Probe(plan: LeafPlan, rowsIn: Long, schemas: Set[String])

  /** Footer rows + distinct footer schemas per plan, on a bounded driver
    * pool (same metadata-only discipline as Merger.footerRows; the probe
    * doubles as the row-count anchor for commit validation).
    */
  private def probe(spark: SparkSession, plans: Seq[LeafPlan]): Seq[Probe] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val pool = Executors.newFixedThreadPool(16)
    try {
      val futures = plans.map { p =>
        pool.submit(new java.util.concurrent.Callable[Probe] {
          override def call(): Probe = {
            var rows = 0L
            val schemas = scala.collection.mutable.Set.empty[String]
            p.files.foreach { f =>
              val r = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f), conf))
              try {
                rows += r.getRecordCount
                schemas += r.getFooter.getFileMetaData.getSchema.toString
              } finally r.close()
            }
            Probe(p, rows, schemas.toSet)
          }
        })
      }
      futures.map(_.get())
    } finally { pool.shutdown(); () }
  }

  /** Scheme-strip normalization applied identically to driver-held paths
    * and `input_file_name()` — "file:/x", "file:///x" and "/x" all map to
    * "/x", so the gid join can't miss on URI-rendering differences.
    */
  private val schemeRe = "^[a-zA-Z][a-zA-Z0-9+.-]*:/+"
  private def norm(p: String): String = "/" + p.replaceFirst(schemeRe, "").dropWhile(_ == '/')

  def mergeAndCommitBatch(spark: SparkSession, plans: Seq[LeafPlan], cfg: CompactorConfig): Seq[LeafResult] = {
    if (plans.isEmpty) return Seq.empty
    val probed =
      try probe(spark, plans)
      catch {
        case _: Throwable => return plans.map(Merger.mergeAndCommit(spark, _, cfg))
      }
    val (homog, mixed) = probed.partition(_.schemas.size == 1)
    // schema-mixed plans keep the bounded-pool concurrency of the normal
    // per-leaf path — they are ordinary solo merges, just routed here
    val soloResults = Compactor.runPlans(spark, mixed.map(_.plan), cfg)
    // One job per (schema, filesystem) group: a single read can't span
    // schemas without mergeSchema, and commit renames can't span
    // filesystems.
    val grouped = homog.groupBy { p =>
      val uri = new Path(p.plan.leaf).toUri
      (p.schemas.head, s"${uri.getScheme}//${uri.getAuthority}")
    }
    val batchResults = grouped.values.toSeq.flatMap { group =>
      if (group.size == 1) Compactor.runPlans(spark, group.map(_.plan), cfg)
      else mergeGroup(spark, group, cfg)
    }
    (soloResults ++ batchResults).sortBy(r => (r.leaf, r.stem))
  }

  private def mergeGroup(spark: SparkSession, group: Seq[Probe], cfg: CompactorConfig): Seq[LeafResult] = {
    val runId = UUID.randomUUID().toString.replace("-", "")
    val stagingRoot = s"${group.head.plan.leaf}/.staging-$runId"
    val fs = FileIndexer.fsFor(spark, group.head.plan.leaf)
    // runId-suffixed helper columns: a data column literally named
    // "__gid"/"__path" must survive the merge untouched (withColumn would
    // silently REPLACE it and drop real data)
    val pathCol = s"__path_$runId"
    val gidCol = s"__gid_$runId"
    try {
      val pathToGid = group.zipWithIndex.flatMap { case (p, gid) =>
        p.plan.files.map(f => (norm(f), gid))
      }
      val gidDf = broadcast(
        spark.createDataFrame(pathToGid).toDF(pathCol, gidCol),
      )
      val allFiles = group.flatMap(_.plan.files)
      val tagged = spark.read
        .parquet(allFiles: _*)
        .withColumn(pathCol, regexp_replace(input_file_name(), schemeRe, "/"))
        .join(gidDf, pathCol)
        .drop(pathCol)
      // ~one partition per group: every plan here is under targetFileBytes,
      // so a group is at most one output file (modulo the row cap, which
      // maxRecordsPerFile still enforces). Hash collisions just mean one
      // task writes several gid dirs.
      tagged
        .repartition(group.size, col(gidCol))
        .write
        .option("compression", "snappy")
        .option("maxRecordsPerFile", cfg.maxRowsPerFile)
        .partitionBy(gidCol)
        .parquet(stagingRoot)

      val results = group.zipWithIndex.map { case (p, gid) =>
        commitOne(spark, fs, p, s"$stagingRoot/$gidCol=$gid", cfg)
      }
      fs.delete(new Path(stagingRoot), true)
      results
    } catch {
      case e: Throwable =>
        try fs.delete(new Path(stagingRoot), true)
        catch { case _: Throwable => () }
        // the batch vehicle failed, not any one plan — retry on the
        // normal bounded-pool path
        System.err.println(s"[compact] batch merge failed (${e.toString}); retrying ${group.size} plans solo")
        Compactor.runPlans(spark, group.map(_.plan), cfg)
    }
  }

  /** Validate one plan's staged subdir against its input footer rows and
    * commit it — or leave its originals untouched and fall back solo.
    */
  private def commitOne(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      p: Probe,
      stagedDir: String,
      cfg: CompactorConfig,
  ): LeafResult = {
    try {
      // a 0-row group writes no partitionBy dir at all — that's a valid
      // empty stage (validated as 0 rows below), not an error
      val staged =
        (try fs.listStatus(new Path(stagedDir))
         catch { case _: java.io.FileNotFoundException => Array.empty[org.apache.hadoop.fs.FileStatus] })
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      var rowsStaged = 0L
      val conf = spark.sparkContext.hadoopConfiguration
      staged.foreach { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(f.getPath, conf))
        try rowsStaged += r.getRecordCount
        finally r.close()
      }
      if (rowsStaged != p.rowsIn) {
        System.err.println(
          s"[compact] batch validation failed for ${p.plan.leaf}/${p.plan.stem} " +
            s"(staged $rowsStaged != input ${p.rowsIn}); retrying solo",
        )
        return Merger.mergeAndCommit(spark, p.plan, cfg)
      }
      if (cfg.commitMode == CommitMode.Manifest) return commitOneManifest(spark, fs, p, staged, rowsStaged, cfg)
      // Track every output that actually lands in the leaf: a rename
      // failure mid-loop leaves the earlier outputs in place, and those
      // carry committed-looking {stem}_{32hex} names — falling back to a
      // solo re-merge with them present would DUPLICATE every row they
      // hold, permanently (the next run merges stray + solo output
      // together). So on failure we first undo the partial commit; only
      // if the leaf is verifiably clean again is the solo retry safe.
      val renamed = scala.collection.mutable.ArrayBuffer.empty[Path]
      try {
        staged.foreach { f =>
          val outName = s"${p.plan.stem}_${UUID.randomUUID().toString.replace("-", "")}.parquet"
          val dest = new Path(s"${p.plan.leaf}/$outName")
          if (fs.rename(f.getPath, dest)) renamed += dest
          else throw new java.io.IOException(s"rename failed for ${f.getPath}")
        }
      } catch {
        case e: Throwable =>
          val undeleted = renamed.filterNot { out =>
            try fs.delete(out, false)
            catch { case _: Throwable => false }
          }
          if (undeleted.isEmpty) {
            // partial commit fully undone — originals untouched, leaf
            // clean, the solo merger can still do the job
            System.err.println(
              s"[compact] batch commit failed for ${p.plan.leaf}/${p.plan.stem} (${e.toString}); retrying solo",
            )
            return Merger.mergeAndCommit(spark, p.plan, cfg)
          }
          // a stray committed-named output survives next to the
          // originals: re-merging now would duplicate its rows. Report
          // failure (solo Merger takes the same stance mid-commit) and
          // leave reconciliation to the operator/next run's visibility.
          return LeafResult(
            p.plan.leaf, p.plan.stem, success = false, 0L, renamed.size,
            Some(
              s"batch commit failed after ${renamed.size} rename(s) (${e.toString}); " +
                s"could not remove ${undeleted.mkString(", ")} — not retrying (would duplicate rows)",
            ),
          )
      }
      val undeletedOriginals = p.plan.files.filterNot { f =>
        try fs.delete(new Path(f), false)
        catch { case _: Throwable => false }
      }
      if (undeletedOriginals.nonEmpty) {
        System.err.println(
          s"[compact] ${undeletedOriginals.size} original(s) in ${p.plan.leaf}/${p.plan.stem} " +
            s"could not be deleted after commit: ${undeletedOriginals.mkString(", ")}",
        )
      }
      LeafResult(
        p.plan.leaf, p.plan.stem, success = true, rowsStaged, renamed.size,
        if (undeletedOriginals.isEmpty) None
        else Some(s"committed, but ${undeletedOriginals.size} original(s) not deleted (duplicates until removed): ${undeletedOriginals.mkString(", ")}"),
      )
    } catch {
      case e: Throwable =>
        // pre-commit surprise (vanished staging, footer read failure):
        // nothing has touched the leaf yet, so the solo merger can still
        // do the job — the batch vehicle must never be the reason a plan
        // fails
        System.err.println(
          s"[compact] batch commit failed for ${p.plan.leaf}/${p.plan.stem} (${e.toString}); retrying solo",
        )
        Merger.mergeAndCommit(spark, p.plan, cfg)
    }
  }

  /** Manifest-mode batch commit for one plan: move its staged files into
    * a hidden `leaf/.data-<runId>/` dir (non-atomic is FINE here — the
    * dir is invisible until publish, so unlike the rename-mode loop
    * there is no partial-visible-commit state and no undo dance), then
    * the atomic manifest PUT, then original GC. Any failure before
    * publish deletes the hidden dir and retries solo — the leaf was
    * never touched visibly.
    */
  private def commitOneManifest(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      p: Probe,
      staged: Array[org.apache.hadoop.fs.FileStatus],
      rowsStaged: Long,
      cfg: CompactorConfig,
  ): LeafResult = {
    val runId = UUID.randomUUID().toString.replace("-", "")
    val dataDir = new Path(s"${p.plan.leaf}/.data-$runId")
    try {
      fs.mkdirs(dataDir)
      val outputsRel = staged.map { f =>
        val dest = new Path(dataDir, f.getPath.getName)
        if (!fs.rename(f.getPath, dest))
          throw new java.io.IOException(s"move into hidden data dir failed for ${f.getPath}")
        s".data-$runId/${f.getPath.getName}"
      }.toSeq
      // same pre-publish sidecar discipline as the solo manifest path:
      // sidecars are debris until the manifest seals, reclaimed with
      // the data dir on rollback
      val outsAbs = outputsRel.map(rel => rel -> s"${p.plan.leaf}/$rel")
      if (cfg.statsColumns.nonEmpty) {
        val st = ManifestStats.collect(spark, outsAbs, cfg.statsColumns)
        if (st.nonEmpty) ManifestStats.write(fs, p.plan.leaf, runId, st)
      }
      if (cfg.bloomColumns.nonEmpty) {
        val bl = ManifestStats.collectBlooms(
          spark, outsAbs, cfg.bloomColumns,
          expectedItems = cfg.maxRowsPerFile, numBits = cfg.bloomBitsPerItem.toLong * cfg.maxRowsPerFile,
        )
        if (bl.nonEmpty) ManifestStats.writeBlooms(fs, p.plan.leaf, runId, bl)
      }
      val inputsRel = p.plan.files.map(ManifestCommit.relativeTo(p.plan.leaf, _))
      // the batch path reads plan files RAW, so it is only correct on a
      // leaf with no merge-on-read delete sidecars (Compactor routes
      // those solo); knownDeletes=empty makes publish abort loudly if
      // one exists or appears — never a silently resurrected row
      ManifestCommit.publish(
        fs, p.plan.leaf, p.plan.stem, runId, inputsRel, outputsRel, rowsStaged, cfg.commitRetries,
        knownDeletes = Some(Set.empty),
      )
      // same retention semantics as the solo manifest path: superseded
      // inputs stay on disk under retainSuperseded for as-of reads
      val undeleted =
        if (cfg.retainSuperseded) Seq.empty
        else p.plan.files.filterNot { f =>
          try fs.delete(new Path(f), false)
          catch { case _: Throwable => false }
        }
      LeafResult(
        p.plan.leaf, p.plan.stem, success = true, rowsStaged, outputsRel.size,
        if (undeleted.isEmpty) None
        else Some(
          s"committed; ${undeleted.size} superseded original(s) not deleted " +
            s"(excluded from the live set by the manifest — debris, not duplicates): ${undeleted.mkString(", ")}",
        ),
      )
    } catch {
      case e: Throwable =>
        // same rollback order as ManifestCommit: the manifest must be
        // verifiably gone before the data dir goes (a sealed manifest
        // naming deleted outputs breaks readers), and the solo retry is
        // only safe once neither artifact can affect the live set
        val mp = new Path(s"${p.plan.leaf}/_manifest-${p.plan.stem}-$runId.json")
        val manifestGone =
          try { fs.delete(mp, false); !fs.exists(mp) }
          catch { case _: Throwable => false }
        if (!manifestGone) {
          return LeafResult(
            p.plan.leaf, p.plan.stem, success = false, 0L, 0,
            Some(s"batch manifest commit failed (${e.toString}) and the manifest could not be removed — not retrying"),
          )
        }
        try fs.delete(dataDir, true)
        catch { case _: Throwable => () }
        ManifestStats.deleteSidecars(fs, p.plan.leaf, runId)
        System.err.println(
          s"[compact] batch manifest commit failed for ${p.plan.leaf}/${p.plan.stem} (${e.toString}); retrying solo",
        )
        Merger.mergeAndCommit(spark, p.plan, cfg)
    }
  }
}
