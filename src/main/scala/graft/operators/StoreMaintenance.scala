package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Scheduled upkeep for the persisted index stores (ROADMAP 63) — the
  * run-loop discipline the table compactor applies to its leaves
  * (gc/expire/checkpoint), applied to [[IvfStore]] and [[BandsStore]]:
  * appends fragment list/band partitions into small files, and data
  * drift skews a frozen IVF codebook's lists. One maintenance entry
  * evaluates both dials and acts only when a threshold trips, so it is
  * safe (and cheap) to run on every ingest cycle:
  *
  *   - retrain when the max/mean list-size ratio exceeds `skewFactor`
  *     ([[IvfStore.needsRetrain]]'s trigger), preserving the store's
  *     current centroid count;
  *   - compact when the store carries more than `smallFileFactor`
  *     parquet files per partition ([[IvfStore.compactLists]] /
  *     [[BandsStore.compact]] fold them to one per partition).
  *
  * Retrain is evaluated FIRST: a retrain rewrites every list anyway, so
  * compaction is re-checked against the post-retrain layout instead of
  * folding files the retrain is about to supersede. All actions carry
  * their store's own crash contract (versioned/pointer-last for IVF;
  * offline-rebuildable swap for bands).
  */
object StoreMaintenance {

  final case class Report(path: String, kind: String, retrained: Boolean, compacted: Boolean)

  private def fragmented(files: Long, partitions: Long, smallFileFactor: Double): Boolean =
    partitions > 0 && files.toDouble > smallFileFactor * partitions

  /** Evaluate and act on one IVF store. */
  def maintainIvf(
      spark: SparkSession,
      path: String,
      smallFileFactor: Double = 2.0,
      skewFactor: Double = 4.0,
      lloydIters: Int = 2,
  ): Report = {
    val retrained =
      if (IvfStore.needsRetrain(spark, path, skewFactor)) {
        val k = IvfStore.codebookDf(spark, path).count().toInt
        IvfStore.retrain(spark, path, nCentroids = k, lloydIters = lloydIters)
        true
      } else false
    def lists = IvfStore.listsDf(spark, path)
    val nLists = lists.select("cid").distinct().count()
    val compacted =
      if (fragmented(lists.inputFiles.length.toLong, nLists, smallFileFactor)) {
        IvfStore.compactLists(spark, path)
        true
      } else false
    Report(path, "ivf", retrained, compacted)
  }

  /** Evaluate and act on one centroid-ROUTED NSW store ([[NswSearch]]).
    * Same two families of drift as the IVF store, different remedies:
    *
    *   - skew: a hot centroid grows a giant shard, and
    *     `searchIndexRouted`'s `flatMapGroups` holds a whole shard in
    *     one task — the max/mean shard-size dial. The remedy is
    *     [[NswSearch.rebuildRouted]] (retrain the quantizer, same shard
    *     count, rebuild the graphs): an ordinal split à la
    *     [[NswSearch.rebalanceIndex]] would orphan the centroid map,
    *     so for routed stores the rebuild IS the rebalance.
    *   - fragmentation: insert/rebalance chains spread live shards
    *     across many version dirs (reader resolution unions that many
    *     scans) and can multiply files per shard — folded by
    *     [[NswSearch.compactIndex]] when either files-per-shard or the
    *     version spread passes its factor.
    *
    * Rebuild is evaluated FIRST (it rewrites everything into one fresh
    * version anyway, so fragmentation is re-checked against the
    * post-rebuild layout); both dials no-op on a healthy store.
    */
  def maintainNswRouted(
      spark: SparkSession,
      path: String,
      smallFileFactor: Double = 2.0,
      skewFactor: Double = 4.0,
      maxVersionSpread: Int = 4,
      m: Int = 8,
      efBuild: Int = 24,
      lloydIters: Int = 2,
  ): Report = {
    def sizes = NswSearch.readIndex(spark, path).groupBy(col("part")).count()
      .collect().map(_.getLong(1))
    val s0 = sizes
    val rebuilt =
      if (s0.length > 1 && s0.max.toDouble > skewFactor * (s0.sum.toDouble / s0.length)) {
        NswSearch.rebuildRouted(spark, path, m = m, efBuild = efBuild, lloydIters = lloydIters)
        true
      } else false
    def index = NswSearch.readIndex(spark, path)
    val nShards = NswSearch.shardOwners(spark, path).size.toLong
    val compacted =
      if (fragmented(index.inputFiles.length.toLong, nShards, smallFileFactor) ||
        NswSearch.versionSpread(spark, path) > maxVersionSpread) {
        NswSearch.compactIndex(spark, path)
        true
      } else false
    Report(path, "nsw-routed", retrained = rebuilt, compacted = compacted)
  }

  /** Evaluate and act on one bands store. */
  def maintainBands(spark: SparkSession, path: String, smallFileFactor: Double = 2.0): Report = {
    def store = spark.read.parquet(path)
    val parts =
      if (store.columns.contains("sigb"))
        store.select(col("band"), col("sigb")).distinct().count()
      else store.select(col("band")).distinct().count()
    val compacted =
      if (fragmented(store.inputFiles.length.toLong, parts, smallFileFactor)) {
        BandsStore.compact(spark, path)
        true
      } else false
    Report(path, "bands", retrained = false, compacted = compacted)
  }

  /** Evaluate and act on one inverted-index store ([[IndexStore]]).
    * The add-log's drift dial is GENERATION SPREAD: every append seals
    * a new `add-<seq>` dir, and a probe unions one partition-pruned
    * scan per generation — folded back to one by
    * [[IndexStore.compact]] when the live generation count passes
    * `maxGenerations`. No retrain dial: the index has no learned
    * geometry, and per-probe scoring re-derives df/avgdl from the
    * current stats, so drift cannot skew answers — only probe fan-out.
    */
  def maintainIndex(
      spark: SparkSession,
      path: String,
      maxGenerations: Int = 4,
  ): Report = {
    val compacted =
      if (IndexStore.generationCount(spark, path) > maxGenerations) {
        IndexStore.compact(spark, path)
        true
      } else false
    Report(path, "index", retrained = false, compacted = compacted)
  }

  /** Evaluate and act on one cluster-representative store
    * ([[ClusterRepStore]]). Like [[maintainIndex]], the drift dial is
    * generation spread — every update seals one members + one bands
    * generation, and each screen unions a scan per generation — folded
    * by [[ClusterRepStore.compact]] past `maxGenerations` (probe-equal
    * by construction; the floor marker keeps every crash window on one
    * edition). No retrain dial: cluster state has no learned geometry.
    */
  def maintainClusterRep(
      spark: SparkSession,
      path: String,
      maxGenerations: Int = 4,
  ): Report = {
    val compacted =
      if (ClusterRepStore.generationCount(spark, path) > maxGenerations) {
        ClusterRepStore.compact(spark, path)
        true
      } else false
    Report(path, "cluster-rep", retrained = false, compacted = compacted)
  }

  /** Evaluate and act on one MANIFEST LEAF's query-key clustering
    * (round-14 prescription 8): Z-order/sort layout is applied at
    * compaction time, but a long arrival history degrades it — every
    * appended batch spans the whole key range, so the leaf's files
    * drift from range-disjoint toward all-overlapping and a point/range
    * read re-opens every file. The dial is
    * [[graft.compact.ManifestStats.clusteringDepth]] — the sidecar-
    * derived average stabbing depth of the live files' [min, max]
    * intervals on `col` (metadata-only; 1.0 = disjoint, fileCount =
    * fully interleaved). Past `maxDepth` the remedy is a range-targeted
    * re-sort THROUGH the normal commit path:
    * [[graft.compact.ManifestCommit.compactWhere]] over the full range
    * with `layoutKeys = [col]` (rank-bucketed layout — correct for any
    * numeric key width) and stats on `col`, so the rewrite seals fresh,
    * tight sidecars and the next evaluation reads ~1.0. A leaf whose
    * sidecars cannot measure the column (missing intervals) is left
    * alone — the dial must never re-sort what it cannot assess.
    */
  def maintainClustering(
      spark: SparkSession,
      leaf: String,
      col: String,
      cfg: graft.compact.CompactorConfig,
      maxDepth: Double = 2.0,
  ): Report = {
    val depth = graft.compact.ManifestStats.clusteringDepth(spark, leaf, col)
    val reclustered =
      if (depth.exists(_ > maxDepth)) {
        val sortCfg = cfg.copy(
          layoutKeys = Seq(col),
          statsColumns = (cfg.statsColumns :+ col).distinct,
        )
        graft.compact.ManifestCommit.compactWhere(
          spark, leaf, col, Double.MinValue, Double.MaxValue, sortCfg, stem = "recluster",
        ).exists(_.success)
      } else false
    Report(leaf, "leaf-clustering", retrained = reclustered, compacted = reclustered)
  }

  /** Evaluate and act on one MANIFEST LEAF's merge-on-read delete
    * backlog (ROADMAP 100): a retention cadence that outruns
    * compaction accumulates standing `.delete-*` sidecars — every read
    * anti-joins their union, every rewrite classifies against each.
    * Past `maxSidecars` they consolidate into ONE via
    * [[graft.compact.ManifestCommit.consolidateDeletes]] (a
    * sidecar-only commit the walk verifies position-preserving and
    * nets to zero — downstream consumers cross it for free). The
    * PHYSICAL fold stays compaction's job; this dial only bounds the
    * read/classify fan-out between compactions.
    */
  def maintainDeleteSidecars(
      spark: SparkSession,
      leaf: String,
      cfg: graft.compact.CompactorConfig,
      maxSidecars: Int = 4,
  ): Report = {
    // position sidecars only: equality sidecars (`.eqdel-*`) pair keys
    // with their own scope and are consolidated by compaction folds,
    // not by this dial — counting them here would make the dial "act"
    // forever on a backlog consolidateDeletes deliberately skips
    val n = graft.compact.ManifestCommit.liveDeletes(spark, leaf)
      .count(graft.compact.ManifestCommit.isPosDeletePath)
    val compacted =
      if (n > maxSidecars)
        graft.compact.ManifestCommit.consolidateDeletes(spark, leaf, cfg).exists(_.success)
      else false
    Report(leaf, "delete-sidecars", retrained = false, compacted = compacted)
  }

  /** Bound the EQUALITY-sidecar backlog (the stacked keyed-retention
    * cadence): every read pays one key anti-join per live eq sidecar
    * and each new keyed delete deepens the `refs` exclusion chains —
    * past `maxSidecars` the dial physically folds them all via
    * [[graft.compact.ManifestCommit.foldEqDeletes]] (one compaction of
    * the union of their scopes; no zero-I/O consolidation exists for
    * equality sidecars — two scopes' keys must never merge into one
    * anti-join table — so the dial pays the rewrite the cadence owed
    * the leaf anyway).
    */
  def maintainEqDeleteSidecars(
      spark: SparkSession,
      leaf: String,
      cfg: graft.compact.CompactorConfig,
      maxSidecars: Int = 4,
  ): Report = {
    // one state resolution: foldEqDeletes itself applies the threshold
    // (None below it) and degrades pre-commit races to a failed result
    val compacted = graft.compact.ManifestCommit
      .foldEqDeletes(spark, leaf, cfg, minSidecars = maxSidecars + 1)
      .exists(_.success)
    Report(leaf, "eq-delete-sidecars", retrained = false, compacted = compacted)
  }

  /** One pass over a fleet of stores. */
  def run(
      spark: SparkSession,
      ivfPaths: Seq[String] = Nil,
      bandsPaths: Seq[String] = Nil,
      nswRoutedPaths: Seq[String] = Nil,
      indexPaths: Seq[String] = Nil,
      clusterRepPaths: Seq[String] = Nil,
  ): Seq[Report] =
    ivfPaths.map(maintainIvf(spark, _)) ++ bandsPaths.map(maintainBands(spark, _)) ++
      nswRoutedPaths.map(maintainNswRouted(spark, _)) ++ indexPaths.map(maintainIndex(spark, _)) ++
      clusterRepPaths.map(maintainClusterRep(spark, _))
}
