package graft.compact

import java.util.concurrent.{Callable, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Orchestration (reference `compact()`, parquet_compactor.py:295-328):
  * one distributed listing, one distributed planning pass, then per-group
  * merge jobs submitted concurrently on a bounded pool — Spark's
  * scheduler interleaves their tasks across the executor, replacing the
  * reference's serial per-leaf Python loop. A failed group never stops
  * the run (SURVEY.md §2.3.9).
  */
object Compactor {

  def run(spark: SparkSession, root: String, cfg: CompactorConfig = CompactorConfig()): Seq[LeafResult] =
    runOnFiles(spark, FileIndexer.list(spark, root), cfg)

  /** Plan + merge over an explicit file-metadata Dataset — the entry the
    * streaming trigger uses to re-plan only the leaves a micro-batch
    * touched, without re-listing the whole root.
    */
  def runOnFiles(
      spark: SparkSession,
      files: org.apache.spark.sql.Dataset[FileMeta],
      cfg: CompactorConfig,
  ): Seq[LeafResult] = {
    import spark.implicits._
    // The plan never lands on the driver whole: toLocalIterator pulls one
    // partition of LeafPlans at a time (each row carries its group's full
    // file list — the multi-GB structure at 10⁶ leaves), and execution
    // consumes it in planBatchSize slices. The orderBy keeps the
    // deterministic (leaf, stem) run order the collect() path had.
    val planIt = Planner.planned(spark, files, cfg)
      .orderBy("leaf", "stem")
      .as[LeafPlan]
      .toLocalIterator()
    val out = scala.collection.mutable.ArrayBuffer.empty[LeafResult]
    planIt.asScala.grouped(math.max(1, cfg.planBatchSize)).foreach { batch =>
      out ++= runBatch(spark, batch.toSeq, cfg)
    }
    out.toSeq
  }

  /** One slice of the plan: tiny single-output-file groups ride the
    * batched one-job path ([[BatchMerger]]); everything else gets its own
    * merge job on the bounded pool. Z-order layout disables the batched
    * path — its one-job partitionBy write can't range-cluster per group,
    * and a layout run wants every leaf through [[Merger.sizeForOutput]]'s
    * range shuffle (layout correctness over job-count savings).
    */
  def runBatch(spark: SparkSession, plans: Seq[LeafPlan], cfg: CompactorConfig): Seq[LeafResult] = {
    val (tiny, big) = plans.partition(p =>
      cfg.batchTinyLeaves && cfg.layoutKeys.isEmpty && cfg.bucketKey.isEmpty &&
        p.totalBytes <= cfg.targetFileBytes &&
        // a leaf carrying merge-on-read delete sidecars must go through
        // the solo path, which folds them into the rewrite — the batch
        // path reads plan files raw and would resurrect deleted rows
        (cfg.commitMode != CommitMode.Manifest ||
          ManifestCommit.liveDeletes(spark, p.leaf).isEmpty))
    val results =
      if (tiny.size < 2) runPlans(spark, plans, cfg)
      else BatchMerger.mergeAndCommitBatch(spark, tiny, cfg) ++ runPlans(spark, big, cfg)
    // Lifecycle maintenance per successfully-committed leaf, after every
    // merge job of the slice is done (the batch and solo paths above run
    // sequentially, so nothing of this run is still writing here).
    if (cfg.commitMode == CommitMode.Manifest &&
      (cfg.autoGcOrphans || cfg.expireKeepSnapshots.nonEmpty || cfg.matAggRoot.nonEmpty))
      results.filter(_.success).map(_.leaf).distinct.foreach(maintainLeaf(spark, _, cfg))
    results
  }

  /** Debris + history reclaim for one leaf — failures here never fail the
    * run (the commits already stand; maintenance retries next run).
    */
  private def maintainLeaf(spark: SparkSession, leaf: String, cfg: CompactorConfig): Unit =
    try {
      if (cfg.autoGcOrphans) { ManifestCommit.gcOrphans(spark, leaf); () }
      cfg.expireKeepSnapshots.foreach { keep =>
        val cur = ManifestCommit.currentSeq(spark, leaf)
        if (cur > keep) {
          ManifestCommit.expireSnapshots(spark, leaf, cur - keep)
          if (cfg.checkpointManifests) { ManifestCommit.checkpoint(spark, leaf, cur - keep); () }
        }
      }
      // Consumer maintenance LAST: gc/expire above may retire the
      // files a refresh's ⊖ term wants, in which case refresh detects
      // it and rebuilds — ordering it after them means the consumers
      // see the post-maintenance filesystem, not a view the expire is
      // about to invalidate.
      val idxPath = cfg.syncIndexRoot.map(MaterializedAgg.pathFor(_, leaf))
      // index bootstrap on first touch (full read through its own API)
      idxPath.foreach { p =>
        if (graft.operators.IndexStore.feedCursor(spark, p).isEmpty) {
          graft.operators.IndexStore.syncFromLeaf(spark, leaf, p); ()
        }
      }
      def buildAgg(aggPath: String): Unit = {
        MaterializedAgg.build(spark, leaf, aggPath, cfg.matAggKeys, cfg.matAggValues,
          minMax = cfg.matAggMinMax)
        ()
      }
      cfg.matAggRoot match {
        case Some(aggRoot) =>
          val aggPath = MaterializedAgg.pathFor(aggRoot, leaf)
          val spec = MaterializedAgg.AggSpec(
            aggPath, cfg.matAggKeys, cfg.matAggValues, minMax = cfg.matAggMinMax)
          if (MaterializedAgg.exists(spark, aggPath))
            try
              idxPath match {
                // both consumers subscribed and bootstrapped: ONE shared
                // window drives them (the tick reads the batch once)
                case Some(p) => SyncTick.tick(spark, leaf, Seq(spec), Some(p)); ()
                case None =>
                  MaterializedAgg.refresh(spark, leaf, aggPath, cfg.matAggKeys, cfg.matAggValues,
                    minMax = cfg.matAggMinMax)
                  ()
              }
            catch {
              // refresh's schema/flag guards throw IllegalArgumentException
              // when the CONFIG drifted from the sealed state (keys/values
              // changed, minMax or sumSqWide toggled). In the run loop the
              // config is the contract — a guard that only ever landed in
              // the maintenance catch-all would freeze the aggregate at
              // the pre-toggle commit forever. Rebuild under the new
              // shape instead; direct refresh() callers still get the
              // loud failure. (In the tick path the index generation has
              // already sealed by then — consumers lag independently.)
              case e: IllegalArgumentException =>
                System.err.println(
                  s"[compact] matagg spec drift on $leaf (${e.getMessage}); rebuilding under the configured shape")
                buildAgg(aggPath)
                // tick already sealed the index generation before the
                // agg threw; this re-sync is a cursor noop there — it
                // exists so no exit of this branch leaves the index
                // behind the window this pass processed
                idxPath.foreach { p => graft.operators.IndexStore.syncFromLeaf(spark, leaf, p); () }
            }
          else {
            buildAgg(aggPath)
            // first-build pass: an already-bootstrapped index (cursor
            // present, so the bootstrap block above skipped it) must
            // still advance this pass — 'consumers land on head every
            // pass' holds even while the aggregate bootstraps
            idxPath.foreach { p => graft.operators.IndexStore.syncFromLeaf(spark, leaf, p); () }
          }
        case None =>
          // index-only subscription: plain cursor sync past bootstrap
          idxPath.foreach { p => graft.operators.IndexStore.syncFromLeaf(spark, leaf, p); () }
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[compact] maintenance on $leaf failed (commits unaffected): ${e.toString}")
    }

  /** One pool slot per LEAF, that leaf's stems run sequentially on it.
    * Two stems of one leaf (the GCP invoice/date shape) committing
    * concurrently would race the manifest seq stamp — a read-modify-write
    * over the same leaf's commit history — and stamp duplicate seqs: the
    * single-writer-per-leaf contract must hold even when the tool itself
    * is the second writer. Cross-leaf parallelism is untouched (leaves
    * are independent filesystems-wise), so the pool still interleaves
    * merge jobs across the cluster exactly as before.
    */
  def runPlans(spark: SparkSession, plans: Seq[LeafPlan], cfg: CompactorConfig): Seq[LeafResult] = {
    if (plans.isEmpty) return Seq.empty
    val leaves = plans.map(_.leaf).distinct
    val byLeaf = plans.groupBy(_.leaf)
    val pool = Executors.newFixedThreadPool(math.max(1, cfg.maxConcurrentLeaves))
    try {
      val futures = leaves.map { leaf =>
        pool.submit(new Callable[Seq[LeafResult]] {
          override def call(): Seq[LeafResult] =
            byLeaf(leaf).map(p => Merger.mergeAndCommit(spark, p, cfg))
        })
      }
      futures.flatMap(_.get())
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      ()
    }
  }
}
