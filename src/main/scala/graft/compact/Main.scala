package graft.compact

import org.apache.spark.sql.SparkSession

/** Config resolution + entry point (reference O11/O12: configurator.py
  * resolves env vs injected config, app.py wires logging and runs
  * `compact()` — SURVEY.md §2.1).
  *
  * Environment surface mirrors the reference's knobs:
  *   GRAFT_DATA_PATH      root of the partitioned lake (required;
  *                        s3a://bucket/prefix or any Hadoop FS URI —
  *                        endpoint/credentials ride the standard
  *                        spark.hadoop.fs.s3a.* configs)
  *   TARGET_FILE_SIZE_GB  candidate threshold & output size target (0.3)
  *   CHUNKED_ROWS         max rows per output file (1000000)
  *   FRESHNESS_DAYS       min age before a new file is compacted (5)
  *   SKIP_SOURCE_TYPE_CURRENT_MONTH  comma list (AWS,Azure)
  *   MAX_CONCURRENT_LEAVES           merge-job pool size (4)
  *   DRY_RUN=1                       print the plan, touch nothing
  *
  * Beyond-reference knobs (GRAFT_-prefixed — no reference equivalent):
  *   GRAFT_LAYOUT_KEYS    comma list of columns to Z-order merged output
  *                        on (OPTIMIZE … ZORDER BY; default off)
  *   GRAFT_LAYOUT_BITS    Morton bits per layout key (16)
  *   GRAFT_COMMIT_MODE    rename (default) | manifest — see CommitMode
  *   GRAFT_STATS_COLUMNS  manifest mode: comma-separated numeric columns
  *                        whose per-file min/max is recorded at commit
  *                        for data-skipping reads (ManifestStats)
  *   GRAFT_BLOOM_COLUMNS  manifest mode: per-file bloom filters for
  *                        point-lookup skipping (readLeafEquals)
  *   GRAFT_GC_ORPHANS=1   manifest mode: reclaim crashed-run .data-*
  *                        debris after each compacted leaf
  *   GRAFT_EXPIRE_KEEP=n  manifest mode: retire history older than the
  *                        newest n commits per leaf (bounded time travel)
  *   GRAFT_CHECKPOINT=1   manifest mode, with GRAFT_EXPIRE_KEEP: fold
  *                        manifests past the expire horizon into one
  *                        checkpoint manifest (bounded manifest count)
  *   GRAFT_COMMIT_RETRIES=n  manifest mode: optimistic re-stamp after a
  *                        detected concurrent commit (default 0 =
  *                        Forbid; input conflicts always fail)
  *   GRAFT_MATAGG_ROOT    manifest mode: maintain an incremental
  *                        materialized GROUP-BY per compacted leaf under
  *                        this root (MaterializedAgg: built on first
  *                        touch, O(delta) refresh thereafter), with
  *   GRAFT_MATAGG_KEYS    comma-separated group-by keys and
  *   GRAFT_MATAGG_VALUES  comma-separated numeric sum columns
  *   GRAFT_SYNC_INDEX     manifest mode: maintain a CDC-synced inverted
  *                        search index per compacted leaf under this
  *                        root (leaf must carry doc_id/text); with a
  *                        matagg configured, both consumers ride ONE
  *                        shared feed window per maintenance pass
  *   GRAFT_MAINT_DELETE_SIDECARS=n  manifest mode: consolidate a leaf's
  *                        POSITION delete-sidecar backlog into one
  *                        sidecar-only commit past n live sidecars
  *   GRAFT_MAINT_EQ_SIDECARS=n      manifest mode: physically fold the
  *                        EQUALITY sidecar backlog (one compaction of
  *                        the scope union) past n live sidecars
  *   GRAFT_RECLUSTER_KEY  manifest mode: re-sort a leaf on this column
  *                        when its sidecar-measured stabbing depth
  *                        exceeds GRAFT_RECLUSTER_DEPTH (default 2.0);
  *                        needs the column in GRAFT_STATS_COLUMNS so
  *                        commits record the intervals the dial reads
  *   GRAFT_MAINT_SWEEP=1  manifest mode: after the compaction pass, run
  *                        the full maintenance pass over EVERY leaf
  *                        under the root — the retention-heavy shape
  *                        where sidecars stack on leaves that never
  *                        re-plan (no commit = no per-commit pass)
  *   GRAFT_CATALOG_ROOT   manifest mode: publish ONE CatalogCommit
  *                        snapshot per run pinning every committed leaf
  *                        at its new head (cross-leaf atomic publish);
  *                        leaf expiry is clamped to the oldest retained
  *                        pin — pair with retainSuperseded semantics
  *   GRAFT_CATALOG_KEEP=n keep the newest n catalog snapshots (expire
  *                        older ones after each publish, moving the
  *                        pinned expiry floor forward)
  *   GRAFT_CATALOG_GROUPS=g publish the two-level snapshot layout with
  *                        g group manifests — publish cost follows
  *                        touched leaves, not total members (set for
  *                        catalogs past ~10⁴ leaves; ~sqrt(members))
  *   GRAFT_CATALOG_POOL=n width of the catalog's driver-side metadata
  *                        IO fan-out (group parses/writes, root parses,
  *                        GC deletes; default 8) — read directly by
  *                        CatalogCommit, not part of CompactorConfig;
  *                        size for per-PUT latency (ARCHITECTURE's
  *                        latency-mode table)
  */
object Main {

  def configFromEnv(env: Map[String, String]): CompactorConfig = {
    // Defaults come from CompactorConfig itself — one source of truth.
    val base = CompactorConfig()
    base.copy(
      targetFileBytes = env.get("TARGET_FILE_SIZE_GB")
        .map(g => (g.toDouble * (1L << 30)).toLong).getOrElse(base.targetFileBytes),
      maxRowsPerFile = env.get("CHUNKED_ROWS").map(_.toLong).getOrElse(base.maxRowsPerFile),
      freshnessDays = env.get("FRESHNESS_DAYS").map(_.toInt).getOrElse(base.freshnessDays),
      skipProvidersCurrentMonth = env.get("SKIP_SOURCE_TYPE_CURRENT_MONTH")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.skipProvidersCurrentMonth),
      maxConcurrentLeaves = env.get("MAX_CONCURRENT_LEAVES").map(_.toInt).getOrElse(base.maxConcurrentLeaves),
      layoutKeys = env.get("GRAFT_LAYOUT_KEYS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.layoutKeys),
      layoutBits = env.get("GRAFT_LAYOUT_BITS").map(_.toInt).getOrElse(base.layoutBits),
      statsColumns = env.get("GRAFT_STATS_COLUMNS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.statsColumns),
      bloomColumns = env.get("GRAFT_BLOOM_COLUMNS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.bloomColumns),
      commitMode = env.get("GRAFT_COMMIT_MODE").map {
        case m if m.equalsIgnoreCase("manifest") => CommitMode.Manifest
        case m if m.equalsIgnoreCase("rename")   => CommitMode.Rename
        case m => sys.error(s"GRAFT_COMMIT_MODE must be rename|manifest, got '$m'")
      }.getOrElse(base.commitMode),
      autoGcOrphans = env.get("GRAFT_GC_ORPHANS")
        .exists(v => v == "1" || v.equalsIgnoreCase("true")),
      expireKeepSnapshots = env.get("GRAFT_EXPIRE_KEEP").map(_.toInt),
      checkpointManifests = env.get("GRAFT_CHECKPOINT")
        .exists(v => v == "1" || v.equalsIgnoreCase("true")),
      commitRetries = env.get("GRAFT_COMMIT_RETRIES").map(_.toInt).getOrElse(0),
      matAggRoot = env.get("GRAFT_MATAGG_ROOT").orElse(base.matAggRoot),
      matAggKeys = env.get("GRAFT_MATAGG_KEYS")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.matAggKeys),
      matAggValues = env.get("GRAFT_MATAGG_VALUES")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.matAggValues),
      matAggMinMax = env.get("GRAFT_MATAGG_MINMAX")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(base.matAggMinMax),
      syncIndexRoot = env.get("GRAFT_SYNC_INDEX").orElse(base.syncIndexRoot),
      maintainDeleteSidecarsMax = env.get("GRAFT_MAINT_DELETE_SIDECARS").map(_.toInt),
      maintainEqSidecarsMax = env.get("GRAFT_MAINT_EQ_SIDECARS").map(_.toInt),
      reclusterColumn = env.get("GRAFT_RECLUSTER_KEY").orElse(base.reclusterColumn),
      reclusterMaxDepth = env.get("GRAFT_RECLUSTER_DEPTH").map(_.toDouble).getOrElse(base.reclusterMaxDepth),
      catalogRoot = env.get("GRAFT_CATALOG_ROOT").orElse(base.catalogRoot),
      catalogKeepSnapshots = env.get("GRAFT_CATALOG_KEEP").map(_.toInt),
      catalogGroups = env.get("GRAFT_CATALOG_GROUPS").map(_.toInt),
    )
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption
      .orElse(sys.env.get("GRAFT_DATA_PATH"))
      .getOrElse(sys.error("GRAFT_DATA_PATH (or argv[0]) is required"))
    val builder = SparkSession.builder()
      .appName("graft-compactor")
      .config("spark.sql.session.timeZone", "UTC")
    // spark-submit injects spark.master; standalone runs fall back to
    // local[*] without overriding a submitted master
    val spark =
      (if (sys.props.contains("spark.master")) builder else builder.master("local[*]"))
        .getOrCreate()
    val cfg = configFromEnv(sys.env)
    if (sys.env.get("DRY_RUN").exists(v => v == "1" || v.equalsIgnoreCase("true"))) {
      // plan only — nothing written, nothing deleted
      val plans = Planner.plan(spark, FileIndexer.list(spark, root), cfg)
      println(s"[compact] DRY RUN: ${plans.size} groups would compact")
      plans.foreach(p =>
        println(s"[compact]   ${p.leaf} stem=${p.stem} files=${p.files.size} bytes=${p.totalBytes}"),
      )
      spark.stop()
    } else {
      val results = Compactor.run(spark, root, cfg)
      if (sys.env.get("GRAFT_MAINT_SWEEP").exists(v => v == "1" || v.equalsIgnoreCase("true"))) {
        val n = Compactor.maintainAll(spark, root, cfg)
        println(s"[compact] maintenance sweep over $n leaves")
      }
      val (ok, bad) = results.partition(_.success)
      println(s"[compact] ${ok.size} groups compacted, ${bad.size} failed")
      bad.foreach(r => println(s"[compact] FAILED ${r.leaf}/${r.stem}: ${r.error.getOrElse("?")}"))
      spark.stop()
      if (bad.nonEmpty) sys.exit(1)
    }
  }
}
