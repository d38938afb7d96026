package graft.compact

/** File-metadata plane (reference: parquet_compactor.py:101-122 builds
  * `(key, size, LastModified)` triples; see SURVEY.md §1.1). `mtimeMs`
  * is epoch millis so the case class has a simple, deterministic
  * Encoder.
  */
final case class FileMeta(path: String, size: Long, mtimeMs: Long)

/** One unit of compaction work: all selected input files of one output
  * group. `stem` is the output-file name stem — the `source=` id (or
  * "data") for standard providers (parquet_compactor.py:236-244), or
  * `<invoice_month>_<date>` for GCP leaves (parquet_compactor.py:188-208)
  * so one output file never mixes GCP dates (SURVEY.md §2.3.7).
  */
final case class LeafPlan(
    leaf: String,
    stem: String,
    files: Seq[String],
    totalBytes: Long,
)

/** Outcome of merging one LeafPlan (per-leaf fault isolation —
  * SURVEY.md §2.3.9).
  */
final case class LeafResult(
    leaf: String,
    stem: String,
    success: Boolean,
    rowsWritten: Long,
    filesWritten: Int,
    error: Option[String],
)

/** How a validated merge output becomes live (SURVEY.md §2.3.8).
  *
  *   - [[CommitMode.Rename]]: staged write → validate → rename into the
  *     leaf → delete originals. Correct wherever `rename` is atomic
  *     (HDFS, POSIX). On object stores rename is copy+delete —
  *     non-atomic and O(bytes) — so a crash mid-commit can duplicate.
  *   - [[CommitMode.Manifest]]: data files are written ONCE into a
  *     hidden `.data-<runId>/` dir and never moved; the commit point is
  *     a single `_manifest-*.json` PUT (atomic on any object store)
  *     naming inputs superseded and outputs added. Readers resolve the
  *     live set via [[ManifestCommit.liveFiles]]; a crash before
  *     publish leaves only invisible debris, a torn manifest upload
  *     fails its seal check and is ignored.
  */
sealed trait CommitMode
object CommitMode {
  case object Rename extends CommitMode
  case object Manifest extends CommitMode
}

/** Knobs mirroring the reference's envelope (BASELINE.md): 0.3 GiB
  * candidate threshold (parquet_compactor.py:21-22), 1M-row output cap
  * (`CHUNKED_ROWS`, :20), 5-day freshness guard (:275), current-month
  * AWS/Azure skip (:24-26). `asOf` injects "now" for deterministic
  * tests; None → current UTC date (reference uses utcnow, :58-66).
  */
final case class CompactorConfig(
    targetFileBytes: Long = (0.3 * (1L << 30)).toLong,
    maxRowsPerFile: Long = 1000000L,
    freshnessDays: Int = 5,
    skipProvidersCurrentMonth: Seq[String] = Seq("AWS", "Azure"),
    asOf: Option[java.time.LocalDate] = None,
    maxConcurrentLeaves: Int = 4,
    // Plans are pulled off the distributed plan in batches of this size
    // (toLocalIterator), so driver memory holds one batch of file lists,
    // never the whole swarm's.
    planBatchSize: Int = 256,
    // Within a batch, plans small enough to produce a single output file
    // (totalBytes <= targetFileBytes) and schema-homogeneous merge in ONE
    // Spark job ([[BatchMerger]]) instead of one job per group, under
    // either commit mode.
    batchTinyLeaves: Boolean = true,
    commitMode: CommitMode = CommitMode.Rename,
    // Optional Z-order layout between merge and write (the OPTIMIZE …
    // ZORDER BY step; operators.ZOrder): output files range-cluster on
    // the Morton interleave of these columns' low `layoutBits` bits, so
    // per-file min/max footer stats prune on EVERY listed column, not
    // just a leading sort key. Leaves whose merged schema lacks any
    // listed column fall back to arrival order (a heterogeneous swarm
    // must not fail on layout); values wider than `layoutBits` wrap and
    // only degrade clustering (ZOrder.mortonCode's clamp contract).
    // Applies under both commit modes.
    layoutKeys: Seq[String] = Nil,
    layoutBits: Int = 16,
    // Bucketed output layout (the PRE-PAID join shuffle), parallel to
    // layoutKeys: when set and the key is present in a leaf's merged
    // schema, merge outputs are written hash-bucketed and sorted on this
    // column into `bucketCount` buckets with Spark's bucketed-file
    // naming, so a catalog table registered over the compacted leaf
    // ([[BucketedLeaf.register]]) joins any co-bucketed peer with ZERO
    // shuffle exchanges — every downstream fact-to-fact join on the
    // bucket key skips its Exchange. Z-order optimizes SCAN pruning;
    // bucketing optimizes JOIN placement — when both are set and the
    // bucket key resolves, bucketing wins (a write has one layout).
    // Tiny-leaf batching is bypassed, as with layoutKeys. RENAME MODE
    // ONLY: manifest leaves resolve their live set by subtraction,
    // which a location-based bucketed table cannot express — in
    // manifest mode the key is ignored rather than paying a bucketBy
    // shuffle no reader can use (BucketedLeaf scaladoc).
    bucketKey: Option[String] = None,
    bucketCount: Int = 8,
    // Manifest mode only: keep superseded input files on disk instead of
    // GC-ing them after publish. They stay excluded from the CURRENT
    // live set (the manifest subtracts them), but remain readable by
    // as-of reads (ManifestCommit.readLeafAt) — the time-travel
    // retention knob. Reclaim later with a deferred gc pass.
    retainSuperseded: Boolean = false,
    // Manifest-mode lifecycle maintenance, run per leaf at the end of the
    // plan slice that compacted it — strictly AFTER every merge job of
    // the slice has completed, so it never races an in-flight commit of
    // this run (a concurrently-writing EXTERNAL compactor is already an
    // operations error — see ConcurrentCommitException).
    //   autoGcOrphans: reclaim .data-* debris left by crashed runs.
    //   expireKeepSnapshots: Some(n) retires history older than the
    //   newest n commits (expireSnapshots at currentSeq - n); pairs with
    //   retainSuperseded to give bounded time travel instead of
    //   unbounded storage growth.
    autoGcOrphans: Boolean = false,
    expireKeepSnapshots: Option[Int] = None,
    //   checkpointManifests: fold manifests older than the expire
    //   horizon into one checkpoint manifest (bounds the per-leaf
    //   manifest FILE count the way expire bounds data files). Only
    //   meaningful together with expireKeepSnapshots — the horizon is
    //   shared, so only already-unreadable history loses granularity.
    checkpointManifests: Boolean = false,
    // Manifest mode: record per-output-file min/max of these NUMERIC
    // columns in a _stats-<runId>.json sidecar at commit time (footer
    // reads only — no data I/O), enabling file-level data skipping via
    // ManifestStats.readLeafWhere without opening every live footer.
    // Advisory: readers keep files with no recorded stats.
    statsColumns: Seq[String] = Nil,
    // Manifest mode: additionally build a per-output-file BLOOM over
    // xxhash64(col) for these columns (one extra scan of the freshly
    // written outputs) into a _bloom-<runId>.json sidecar — the
    // point-lookup complement to statsColumns' range intervals
    // (ManifestStats.readLeafEquals). Advisory, like the stats.
    bloomColumns: Seq[String] = Nil,
    // Bloom sidecar sizing dial: numBits = bloomBitsPerItem ×
    // maxRowsPerFile. The StatsBench bits-ladder prices it on a real
    // unique-valued column (measured: 2 bits ≈ 38% fpp, 5 ≈ 9%,
    // 10 ≈ 0.6%, 16 ≈ 0.05%); sidecar bytes scale linearly with bits.
    // The default is sized for KEY-SET probes, not single points: a
    // merge/keyed-delete classification probes each file with a whole
    // key batch and the per-key fpp COMPOUNDS — P(any FP) ≈
    // 1-(1-fpp)^|keys| — so 10 bits (fine for single lookups) kept
    // 14/43 innocent files against a 50-key batch (≈30%/file,
    // measured r16). At 16 bits the same batch compounds to ≈2% and
    // the prune holds ≤3/43 (StatsBench merge_classify + fpp50
    // ladder), for 1.6× the sidecar bytes — still metadata-scale.
    bloomBitsPerItem: Int = 16,
    // Manifest-mode lifecycle: maintain an incrementally-refreshed
    // materialized GROUP-BY ([[MaterializedAgg]]) per compacted leaf.
    // State for leaf L lives at MaterializedAgg.pathFor(matAggRoot, L)
    // (sanitized leaf tail + digest — stable, fs-safe); built on
    // first touch, then refreshed O(delta) after every commit batch (a
    // compaction's adds and removes net to zero through the ⊖ term).
    // Pair with retainSuperseded so the removed-file side of a delta
    // stays readable between runs; a GC'd delta degrades to a full
    // rebuild, never to a wrong answer.
    matAggRoot: Option[String] = None,
    matAggKeys: Seq[String] = Nil,
    matAggValues: Seq[String] = Nil,
    // min/max columns maintained via the per-file partials table
    // (MaterializedAgg's semigroup path — survives delete-rewrites)
    matAggMinMax: Seq[String] = Nil,
    // Manifest-mode lifecycle: maintain a CDC-synced inverted search
    // index ([[graft.operators.IndexStore]]) per compacted leaf (the
    // leaf must carry doc_id/text columns). Store for leaf L lives at
    // MaterializedAgg.pathFor(syncIndexRoot, L) (same sanitized
    // naming). Bootstrapped on first touch via syncFromLeaf; when a
    // materialized agg is ALSO configured, subsequent maintenance
    // drives BOTH consumers from one shared ChangeFeed window
    // ([[SyncTick]]) — the commit batch is read once, not once per
    // consumer.
    syncIndexRoot: Option[String] = None,
    // Manifest mode: optimistic retries when the head-stamp tripwire
    // detects a concurrent same-seq writer. 0 (default) = the
    // reference's Forbid semantics — collide, roll back, fail loudly.
    // N > 0 = retract the stale-seq manifest, re-resolve (now seeing
    // the racer's commit), validate that none of OUR inputs were
    // superseded by it (a real conflict still fails — re-stamping
    // would duplicate rows), and re-stamp; up to N times.
    commitRetries: Int = 0,
    // Manifest-mode LEAF maintenance dials (round-16 verdict: spec-
    // proven machinery with no production caller), evaluated in the
    // per-leaf maintenance pass BEFORE gc/expire and the consumer
    // refresh. Each acts only past its threshold — safe every run:
    //   maintainDeleteSidecarsMax: Some(n) consolidates the POSITION
    //   sidecar backlog into one sidecar-only commit past n live
    //   sidecars (zero data I/O — bounds the read anti-join fan-out
    //   between compactions).
    //   maintainEqSidecarsMax: Some(n) physically folds the EQUALITY
    //   sidecar backlog (one compaction of the scope union) past n —
    //   the rewrite the keyed-retention cadence owed the leaf anyway.
    //   reclusterColumn: re-sort the leaf on this column through the
    //   normal commit path when the sidecar-measured stabbing depth
    //   exceeds reclusterMaxDepth (1.0 = range-disjoint; unmeasurable
    //   leaves are never touched).
    maintainDeleteSidecarsMax: Option[Int] = None,
    maintainEqSidecarsMax: Option[Int] = None,
    reclusterColumn: Option[String] = None,
    reclusterMaxDepth: Double = 2.0,
    // Multi-leaf ATOMIC publish (CatalogCommit): when set, ONE catalog
    // snapshot per Compactor.run pins every leaf the run successfully
    // committed at its new head — a partitioned dataset's maintenance
    // pass lands cross-leaf-atomically for catalog readers. Leaf
    // expiry is clamped to the oldest retained pin (a pinned read is
    // readLeafAt — its history is a retention dependency); pair with
    // retainSuperseded so pinned reads stay resolvable between runs.
    // catalogKeepSnapshots bounds the snapshot history itself: Some(n)
    // expires catalog snapshots older than the newest n after each
    // publish (which moves oldestPin forward and unblocks leaf expiry).
    // catalogGroups switches the snapshot to the two-level root →
    // group-manifest layout with this many groups (publish cost
    // proportional to touched leaves instead of O(members) — the
    // swarm-scale form; ~sqrt(expected member count) is a good G).
    // None carries the catalog's current format forward.
    catalogRoot: Option[String] = None,
    catalogKeepSnapshots: Option[Int] = None,
    catalogGroups: Option[Int] = None,
) {
  def asOfDate: java.time.LocalDate =
    asOf.getOrElse(java.time.LocalDate.now(java.time.ZoneOffset.UTC))
}
