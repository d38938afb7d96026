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

  /** Standalone maintenance sweep over EVERY leaf under `root` — the
    * retention-heavy deployment shape the per-commit maintenance pass
    * misses: a leaf whose files are already at target size never
    * re-plans, so a keyed-delete cadence that outruns arrivals would
    * stack sidecars on it unboundedly while [[runBatch]]'s maintenance
    * (which rides successful commits) never fires. One sweep resolves
    * the leaf set from the same distributed listing the planner uses
    * and runs the full [[maintainLeaf]] pass (dials, gc, expire,
    * checkpoint, consumer refresh) on each; every dial no-ops below
    * its threshold, so a healthy lake costs one metadata pass. Wired
    * behind GRAFT_MAINT_SWEEP in [[Main]].
    */
  def maintainAll(spark: SparkSession, root: String, cfg: CompactorConfig): Long = {
    import spark.implicits._
    require(cfg.commitMode == CommitMode.Manifest, "the maintenance sweep operates on manifest leaves")
    // leaf names stream to the driver one partition at a time — the
    // same no-whole-plan-on-the-driver discipline as runOnFiles. A
    // manifest leaf's files live in hidden subdirs (.data-*, .delete-*,
    // .eqdel-*): the leaf is the parent of the first hidden component
    // BELOW THE ROOT, not the file's immediate dir — and the search
    // must start past the root prefix, or a lake mounted under any
    // dot-directory (/srv/.cache/lake) would truncate every leaf to
    // that ancestor and the sweep would maintain nothing real.
    val rootPfx = ManifestCommit.qualifiedPrefix(spark, root)
    val rootDir = rootPfx.dropRight(1)
    val leafIt = FileIndexer.list(spark, root)
      .map { f =>
        val from = if (f.path.startsWith(rootPfx)) rootPfx.length else 0
        val i = f.path.indexOf("/.", from)
        if (i > 0) f.path.substring(0, i)
        else f.path.substring(0, f.path.lastIndexOf('/'))
      }
      // a file sitting DIRECTLY under the root with no hidden component
      // (a _cat-*.json when the catalog root IS the lake root, a stray
      // marker) derives to the root itself — not a leaf; submitting it
      // would run a maintenance pass over the whole-lake dir and inflate
      // the swept count (advice r17)
      .filter(_ != rootDir)
      .distinct().orderBy("value").as[String]
      .toLocalIterator()
    // Leaves are independent (own manifest log, own consumers), so the
    // sweep parallelizes on the same bounded pool discipline as
    // runPlans — one slot per leaf, maintainLeaf still single-writer
    // per leaf. At 10⁵ leaves this turns a serial chain of ~0.2 s dial
    // commits into pool-wide throughput; the no-op pass is metadata
    // (~2 ms/leaf) either way. maintainLeaf swallows its own failures
    // (maintenance never fails the sweep), so the futures only carry
    // completion.
    val pool = Executors.newFixedThreadPool(math.max(1, cfg.maxConcurrentLeaves))
    // catalog pin floors parsed ONCE for the whole sweep (r17 weak
    // component: oldestPin per leaf re-parsed every retained snapshot —
    // O(leaves × snapshots × members) driver JSON under maintainAll)
    val catPins = catalogOldestPins(spark, cfg)
    try {
      val futures = scala.collection.mutable.ArrayBuffer.empty[java.util.concurrent.Future[_]]
      var n = 0L
      leafIt.asScala.foreach { leaf =>
        n += 1
        futures += pool.submit(new Runnable {
          override def run(): Unit = maintainLeaf(spark, leaf, cfg, catPins)
        })
      }
      futures.foreach(_.get())
      n
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      ()
    }
  }

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
    // the catalog cannot advance until publishCatalog below, so the pin
    // floors are parsed at most ONCE for the whole run, not per batch
    // (review r18) — lazily, since a run with zero successful commits
    // never needs them
    lazy val floors = catalogOldestPins(spark, cfg)
    planIt.asScala.grouped(math.max(1, cfg.planBatchSize)).foreach { batch =>
      out ++= runBatch(spark, batch.toSeq, cfg, () => floors)
    }
    publishCatalog(spark, out.toSeq, cfg)
    out.toSeq
  }

  /** ONE cross-leaf snapshot per run (ROADMAP 113): pin every leaf the
    * run successfully committed at its post-run head. Runs AFTER every
    * batch (and its maintenance — the dial commits are part of the head
    * being pinned), so catalog readers flip from pre-run-everything to
    * post-run-everything in one create. Failures never fail the run —
    * the leaf commits already stand; the next run's publish heals
    * (crash window 1 of the CatalogCommit matrix). A successfully-
    * committed leaf OUTSIDE the catalog root is a config error and
    * fails loudly — silently skipping it would publish a snapshot
    * claiming run-atomicity it doesn't have.
    */
  private def publishCatalog(spark: SparkSession, results: Seq[LeafResult], cfg: CompactorConfig): Unit =
    cfg.catalogRoot.foreach { cat =>
      val touched = results.filter(_.success).map(_.leaf).distinct.sorted
      if (touched.nonEmpty) {
        require(cfg.commitMode == CommitMode.Manifest, "a catalog publish pins manifest leaf seqs")
        // both sides fs-qualified: the listing emits qualified paths
        // (file:/…, s3a://…) while the configured root may be bare
        val pfx = ManifestCommit.qualifiedPrefix(spark, cat)
        val updates = touched.map { leaf =>
          val leafQ = ManifestCommit.qualifiedPrefix(spark, leaf).dropRight(1)
          require(leafQ.startsWith(pfx) && leafQ.length > pfx.length,
            s"compacted leaf $leaf is not under the catalog root $cat")
          leafQ.substring(pfx.length) -> ManifestCommit.currentSeq(spark, leaf)
        }.toMap
        try {
          val snap = CatalogCommit.publish(spark, cat, updates, groups = cfg.catalogGroups)
          // bounded snapshot history: expiring old snapshots moves
          // oldestPin forward, which is what unblocks leaf expiry. An
          // UNBOUNDED catalog with leaf expiry configured would pin
          // the expire horizon at the first snapshot forever — a
          // silent storage leak; say so loudly once per run.
          cfg.catalogKeepSnapshots match {
            case Some(keep) =>
              if (snap.seq > keep) { CatalogCommit.expire(spark, cat, snap.seq - keep + 1); () }
            case None =>
              if (cfg.expireKeepSnapshots.nonEmpty)
                System.err.println(
                  s"[compact] WARNING: catalog $cat retains every snapshot (GRAFT_CATALOG_KEEP unset) " +
                    "while leaf expiry is configured — oldestPin clamps the expire horizon at the first " +
                    "pin forever and superseded files accumulate unboundedly; set GRAFT_CATALOG_KEEP")
          }
        } catch {
          case e: Throwable =>
            System.err.println(s"[compact] catalog publish on $cat failed (leaf commits stand): ${e.toString}")
        }
      }
    }

  /** One slice of the plan: tiny single-output-file groups ride the
    * batched one-job path ([[BatchMerger]]); everything else gets its own
    * merge job on the bounded pool. Z-order layout disables the batched
    * path — its one-job partitionBy write can't range-cluster per group,
    * and a layout run wants every leaf through [[Merger.sizeForOutput]]'s
    * range shuffle (layout correctness over job-count savings).
    */
  def runBatch(spark: SparkSession, plans: Seq[LeafPlan], cfg: CompactorConfig): Seq[LeafResult] = {
    lazy val floors = catalogOldestPins(spark, cfg)
    runBatch(spark, plans, cfg, () => floors)
  }

  /** [[runBatch]] with the catalog pin floors supplied by the caller —
    * [[runOnFiles]] parses them once for ALL its batches.
    */
  private def runBatch(
      spark: SparkSession,
      plans: Seq[LeafPlan],
      cfg: CompactorConfig,
      floors: () => CatalogFloors,
  ): Seq[LeafResult] = {
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
      (cfg.autoGcOrphans || cfg.expireKeepSnapshots.nonEmpty || cfg.matAggRoot.nonEmpty ||
        cfg.syncIndexRoot.nonEmpty || cfg.maintainDeleteSidecarsMax.nonEmpty ||
        cfg.maintainEqSidecarsMax.nonEmpty || cfg.reclusterColumn.nonEmpty)) {
      val okLeaves = results.filter(_.success).map(_.leaf).distinct
      if (okLeaves.nonEmpty) {
        // one snapshot-set parse per RUN (threaded from runOnFiles),
        // not per batch or per leaf
        val catPins = floors()
        okLeaves.foreach(maintainLeaf(spark, _, cfg, catPins))
      }
    }
    results
  }

  /** The per-leaf catalog pin floors for [[maintainLeaf]]'s expire
    * clamp — a tri-state, because the failure mode matters: with no
    * catalog configured expiry runs unclamped, with floors in hand it
    * runs clamped, but when the configured catalog cannot be READ the
    * only safe answer is to not expire at all (an absent clamp would
    * GC under pins the read failure hid — the one wrong default).
    */
  private[compact] sealed trait CatalogFloors
  private[compact] case object NoCatalog extends CatalogFloors
  private[compact] case object FloorsUnavailable extends CatalogFloors
  private[compact] final case class Floors(pins: Map[String, Long]) extends CatalogFloors

  /** Parsed ONCE per run/sweep and threaded into [[maintainLeaf]]
    * (computed only when leaf expiry is configured — nothing else
    * reads pins). Conservative under racers: a stale map can only
    * hold pins that have since EXPIRED, so the clamp it imposes is
    * at-or-below the live horizon, never past it. Failures stay
    * inside maintenance ("maintenance never fails the run"): a
    * catalog read error yields [[FloorsUnavailable]], never a throw.
    */
  private def catalogOldestPins(spark: SparkSession, cfg: CompactorConfig): CatalogFloors =
    cfg.catalogRoot.filter(_ => cfg.expireKeepSnapshots.nonEmpty) match {
      case None => NoCatalog
      case Some(cat) =>
        try Floors(CatalogCommit.oldestPins(spark, cat))
        catch {
          case e: Throwable =>
            System.err.println(
              s"[compact] catalog $cat pin floors unreadable (${e.toString}) — " +
                "leaf expiry SKIPPED this pass rather than risk GC under a hidden pin")
            FloorsUnavailable
        }
    }

  /** Debris + history reclaim for one leaf — failures here never fail the
    * run (the commits already stand; maintenance retries next run).
    */
  private def maintainLeaf(
      spark: SparkSession,
      leaf: String,
      cfg: CompactorConfig,
      catalogPins: CatalogFloors,
  ): Unit =
    try {
      // The LEAF DIALS first — each is a normal manifest COMMIT (a
      // sidecar consolidation, a backlog fold, a re-sort) that acts
      // only past its threshold, so gc/expire below measure the
      // post-dial history and the consumer refresh at the bottom
      // crosses the dial commits in the same pass (the walk nets the
      // consolidation to zero and classifies the folds exactly).
      // Ordering among the dials: the position consolidation is zero
      // data I/O; the recluster rewrite FOLDS any sidecars whose scope
      // its full-range plan covers, so when it acts the eq dial after
      // it usually no-ops instead of paying a second rewrite.
      cfg.maintainDeleteSidecarsMax.foreach { mx =>
        graft.operators.StoreMaintenance.maintainDeleteSidecars(spark, leaf, cfg, maxSidecars = mx); ()
      }
      cfg.reclusterColumn.foreach { c =>
        graft.operators.StoreMaintenance.maintainClustering(
          spark, leaf, c, cfg, maxDepth = cfg.reclusterMaxDepth); ()
      }
      cfg.maintainEqSidecarsMax.foreach { mx =>
        graft.operators.StoreMaintenance.maintainEqDeleteSidecars(spark, leaf, cfg, maxSidecars = mx); ()
      }
      if (cfg.autoGcOrphans) { ManifestCommit.gcOrphans(spark, leaf); () }
      cfg.expireKeepSnapshots.foreach { keep =>
        val cur = ManifestCommit.currentSeq(spark, leaf)
        // FloorsUnavailable = the configured catalog could not be read
        // this pass: expiry (and its checkpoint) skip entirely — an
        // unclamped horizon could GC under a pin the failure hid
        if (cur > keep && catalogPins != FloorsUnavailable) {
          // a catalog pin is a retention dependency: a pinned read is
          // readLeafAt(pin), so the expire horizon never crosses the
          // oldest seq any retained catalog snapshot pins this leaf at
          val horizon0 = cur - keep
          val horizon = (cfg.catalogRoot, catalogPins) match {
            case (Some(cat), Floors(pins)) =>
              val pfx = ManifestCommit.qualifiedPrefix(spark, cat)
              val leafQ = ManifestCommit.qualifiedPrefix(spark, leaf).dropRight(1)
              if (leafQ.startsWith(pfx) && leafQ.length > pfx.length)
                pins.get(leafQ.substring(pfx.length))
                  .fold(horizon0)(math.min(horizon0, _))
              else horizon0
            case _ => horizon0
          }
          ManifestCommit.expireSnapshots(spark, leaf, horizon)
          if (cfg.checkpointManifests) { ManifestCommit.checkpoint(spark, leaf, horizon); () }
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
