package graft.compact

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Merge + commit for one LeafPlan.
  *
  * The reference streams a chunked union of the inputs and re-emits
  * <=1M-row snappy files, then deletes the originals — write-then-delete,
  * non-atomic, duplicating on partial failure (parquet_compactor.py:153-181,
  * :230-234, :327-328). Here (SURVEY.md §7.4):
  *
  *   1. read all inputs in one multi-path scan (`mergeSchema=true` — the
  *      schema unification pyarrow did implicitly, SURVEY.md §7.6.6),
  *   2. coalesce (no shuffle) to ceil(totalBytes/targetFileBytes) output
  *      partitions and cap rows per file — the reference only row-caps,
  *      we also size-target,
  *   3. write to `leaf/.staging-<runid>/` with snappy,
  *   4. validate: rows staged == rows read (via `Observation`, no second
  *      scan of the inputs),
  *   5. commit: rename staged files to `{stem}_{32hex}.parquet` in the
  *      leaf, delete originals, drop staging.
  *
  * A crash before 5 leaves only ignorable staging debris (the Planner
  * filters `.staging-*`); a crash mid-5 can leave duplicates but never
  * loses rows — the reference's at-least-once bar (SURVEY.md §2.3.8).
  */
object Merger {

  def mergeAndCommit(spark: SparkSession, plan: LeafPlan, cfg: CompactorConfig): LeafResult =
    try {
      val runId = UUID.randomUUID().toString.replace("-", "")
      val stagingDir = s"${plan.leaf}/.staging-$runId"
      val fs = FileIndexer.fsFor(spark, plan.leaf)

      val df = spark.read
        .option("mergeSchema", "true")
        .parquet(plan.files: _*)

      val nOut = math.max(1L, (plan.totalBytes + cfg.targetFileBytes - 1) / cfg.targetFileBytes).toInt
      val obs = Observation()
      df.observe(obs, count(lit(1)).as("rows"))
        .coalesce(nOut)
        .write
        .option("compression", "snappy")
        .option("maxRecordsPerFile", cfg.maxRowsPerFile)
        .parquet(stagingDir)
      val rowsRead = obs.get("rows").asInstanceOf[Long]

      // Validate the staged output before touching the originals.
      val rowsStaged = spark.read.parquet(stagingDir).count()
      if (rowsStaged != rowsRead) {
        fs.delete(new Path(stagingDir), true)
        return LeafResult(
          plan.leaf, plan.stem, success = false, rowsStaged, 0,
          Some(s"validation failed: staged $rowsStaged rows != read $rowsRead"),
        )
      }

      // Commit: move staged parts into place under idempotence-friendly
      // names ({stem}_{32hex}.parquet — recognized by the Planner's
      // compacted classifier on the next run), then delete originals.
      val staged = fs
        .listStatus(new Path(stagingDir))
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      var moved = 0
      staged.foreach { f =>
        val outName = s"${plan.stem}_${UUID.randomUUID().toString.replace("-", "")}.parquet"
        if (fs.rename(f.getPath, new Path(s"${plan.leaf}/$outName"))) moved += 1
        else throw new java.io.IOException(s"rename failed for ${f.getPath}")
      }
      plan.files.foreach(p => fs.delete(new Path(p), false))
      fs.delete(new Path(stagingDir), true)

      LeafResult(plan.leaf, plan.stem, success = true, rowsStaged, moved, None)
    } catch {
      case e: Exception =>
        LeafResult(plan.leaf, plan.stem, success = false, 0L, 0, Some(e.toString))
    }
}
