package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental cluster-representative maintenance — keep-best fuzzy
  * dedup over a persisted corpus memory, WITH RETRACTIONS.
  *
  * The one-shot `dedup_cluster_rep` query labels near-dup clusters
  * (connected components of the MinHash-LSH candidate graph) and keeps
  * the best member of each (quality DESC, doc_id tiebreak). A streaming
  * corpus cannot re-run that over 100 TB per ingest: a new batch can
  * MERGE previously-separate clusters (only through one of its own docs
  * — stored docs' pairs never change) or DISPLACE a keeper, so the store
  * must both absorb the batch in batch-proportional work and tell
  * downstream consumers what to unpublish. Each [[update]] therefore
  * emits a changefeed of `(op ∈ assert|retract, doc_id, cluster)` rows:
  * folding `asserts ⊖ retracts` across the whole history reproduces the
  * kept set of the one-shot query on the unioned corpus exactly
  * (ClusterRepStoreSpec pins it on randomized splits).
  *
  * Never-rewrite-the-corpus design — the per-batch work is bounded by
  * the batch and its candidate pairs, not the store:
  *
  *   - `members/sq=<s>/db=<b>/` — add-log of (doc_id, quality,
  *     orig_cluster), hash-bucketed by doc_id so the screen's lookup of
  *     matched old docs is a static-partition-pruned read. A member row
  *     is written ONCE; cluster merges never touch it.
  *   - `bands/sq=<s>/band=<b>/` — the batch's LSH band signatures
  *     (the shared [[graft.queries.DedupQueries.minhashBands]] kernel,
  *     same rowsPerBand as the one-shot queries), band-partitioned like
  *     [[BandsStore]] so the screen join prunes to matching bands.
  *   - `alias-<seq>/` — the UNION-FIND indirection that makes merges
  *     O(merge) instead of O(cluster): member rows keep the canonical
  *     label their cluster had at insert time; a merge only rewrites
  *     this merge-count-sized table (path-compressed every seal, so
  *     resolution is always one hop). Relabeling a million-member
  *     cluster costs one small-table row, zero member rewrites.
  *   - `keepers-<seq>/` — current (cluster, doc_id, quality) for
  *     MULTI-member clusters only; singletons are implicitly their own
  *     keeper, so the table is bounded by the duplicate count, not the
  *     corpus.
  *   - `feed/sq=<s>/` — the retained changefeed of every seal.
  *   - `_current-<seq>` — create-only pointer, sealed LAST (the
  *     IvfStore/NswSearch crash discipline). Readers filter every
  *     add-log to `floor ≤ sq ≤ sealed` (the floor marker is how
  *     [[compact]] retires folded generations), so a crashed update's
  *     debris is invisible and the next attempt deletes-then-redoes it —
  *     re-ingest can never double-count a batch.
  *
  * Merge mechanics: the new pairs are contracted onto cluster canons —
  * each stored cluster is ONE node (its canonical label, which is by
  * induction the min doc_id of its members), each batch doc one node —
  * and min-label connected components run on that batch-scale graph
  * ([[ConnectedComponents.minLabel]], adaptively driver-local). The
  * merged group's label is the min over {canon labels, new ids} = the
  * true component min; its keeper is the argmax over {old cluster
  * keepers, matched old singletons, new members} — old non-keepers are
  * dominated by their own cluster keeper, so they never need reading.
  */
object ClusterRepStore {

  private val Ptr = graft.compact.VersionedPointer.Current
  private val TagRe = "tag-(\\d+)-([0-9a-f]+)".r

  private def tagHash(tag: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString

  /** doc_id hash buckets under each members/sq=<s>/ generation. */
  val DocBuckets = 16

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def currentSeq(spark: SparkSession, path: String): Option[Long] =
    Ptr.resolve(fsOf(spark, path), path)

  private def docBucket = pmod(crc32(col("doc_id").cast("string").cast("binary")), lit(DocBuckets.toLong)).cast("int")

  // explicit schemas: the add-log reads must never infer from a footer
  // (inference opens an arbitrary file — possibly one the partition
  // prune is about to skip) and the layouts are fixed by this writer
  private val membersSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id LONG, quality LONG, orig LONG, sq INT, db INT")
  private val bandsSchema = org.apache.spark.sql.types.StructType.fromDDL(
    "doc_id LONG, sig STRING, sq INT, band INT")

  private def readAlias(spark: SparkSession, path: String, seq: Long): DataFrame =
    spark.read.parquet(s"$path/alias-$seq").select(col("orig").as("a_orig"), col("canon").as("a_canon"))

  private def readKeepers(spark: SparkSession, path: String, seq: Long): DataFrame =
    spark.read.parquet(s"$path/keepers-$seq").select(col("cluster").as("k_cluster"), col("doc_id").as("k_doc"), col("quality").as("k_q"))

  /** Retraction tombstones ([[retract]]): docs removed from the corpus.
    * Their member/band rows STAY — the sticky-component contract keeps
    * historical edges working (a future near-dup of a dead doc still
    * joins its cluster, exactly like the all-docs oracle) — but they
    * never appear in assignments and never candidate for keeperships.
    */
  private def readTombstones(spark: SparkSession, path: String, headSeq: Long): DataFrame = {
    val fs = fsOf(spark, path)
    if (!fs.exists(new Path(s"$path/removed"))) spark.range(0).select(col("id").as("t_doc"))
    else
      spark.read.schema(org.apache.spark.sql.types.StructType.fromDDL("doc_id LONG, sq INT"))
        .parquet(s"$path/removed")
        .where(col("sq") <= headSeq)
        .select(col("doc_id").as("t_doc"))
  }

  /** Absorb one `(doc_id, text, quality)` batch; returns the changefeed
    * written for this seal (op, doc_id, cluster, quality). Batches must
    * carry globally-unique doc_ids (the usual ingest contract; a
    * replayed CRASHED batch is fine — debris is swept, see above).
    *
    * `batchTag` makes a SEALED update replay-idempotent — the
    * at-least-once contract a `foreachBatch` caller needs: a replay
    * delivers the same batchId with identical content, so an update
    * whose tag is already sealed (at ANY seq — a maintenance compact
    * may have bumped the head since) returns that seal's feed instead
    * of absorbing the batch twice. Tag markers are feed-history-sized
    * and never reclaimed.
    */
  def update(spark: SparkSession, path: String, batchIn: DataFrame, batchTag: Option[String] = None): DataFrame = {
    val fs = fsOf(spark, path)
    val sealedOpt = currentSeq(spark, path)
    val headSeq = sealedOpt.getOrElse(0L)
    val s = headSeq + 1
    batchTag.foreach { tag =>
      // the tag HASH lives in the marker NAME, so the replay check is a
      // pure listing (one metadata op regardless of stream history) —
      // reading one tiny file per historical batch would make every
      // micro-batch O(batches-so-far) object-store GETs
      val h = tagHash(tag)
      val applied = if (!fs.exists(new Path(path))) None
      else fs.listStatus(new Path(path)).collectFirst {
        case e if TagRe.findFirstMatchIn(e.getPath.getName).exists(m => m.group(2) == h) =>
          TagRe.findFirstMatchIn(e.getPath.getName).get.group(1).toLong
      }
      applied.foreach { seq =>
        if (seq <= headSeq) return spark.read.parquet(s"$path/feed/sq=$seq")
      }
    }
    // sweep a crashed attempt's unsealed debris so the redo is exact
    Seq(s"$path/members/sq=$s", s"$path/bands/sq=$s", s"$path/alias-$s", s"$path/keepers-$s", s"$path/feed/sq=$s")
      .foreach(d => fs.delete(new Path(d), true))
    if (fs.exists(new Path(path)))
      fs.listStatus(new Path(path))
        .filter(e => TagRe.findFirstMatchIn(e.getPath.getName).exists(_.group(1).toLong == s))
        .foreach(e => fs.delete(e.getPath, false))

    // every persisted frame lands here so a FAILED update (write error,
    // concurrent sealer) cannot strand cached blocks across foreachBatch
    // retries — the unpersist runs in the finally below
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def tracked(df: DataFrame): DataFrame = { df.cache(); cached += df; df }
    try {
    val batch = tracked(batchIn
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("quality").cast("long").as("quality")))
    val bands = tracked(graft.queries.DedupQueries.minhashBands(spark, batch))

    val emptyPairs = batch.select(col("doc_id").as("nd"), col("doc_id").as("od")).where(lit(false))
    // cross pairs: batch bands vs the SEALED history (sq <= sealed), the
    // same (band, sig) criterion as the one-shot kernel; the id guard is
    // the re-ingest self-pair class every screen here carries
    val cross = (if (sealedOpt.isEmpty) emptyPairs
                 else {
                   val floor = floorOf(spark, path, headSeq)
                   val hist = spark.read.schema(bandsSchema).parquet(s"$path/bands")
                     .where(col("sq").between(floor, headSeq))
                   bands.as("x")
                     .join(
                       hist.as("y"),
                       col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
                         col("x.doc_id") =!= col("y.doc_id"),
                     )
                     .select(col("x.doc_id").as("nd"), col("y.doc_id").as("od"))
                     .distinct()
                 })
    cross.cache(); cached += cross

    val within = bands.as("x")
      .join(
        bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"),
      )
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()

    val alias =
      if (sealedOpt.isEmpty) batch.select(col("doc_id").as("a_orig"), col("doc_id").as("a_canon")).where(lit(false))
      else readAlias(spark, path, headSeq)
    val keepers =
      if (sealedOpt.isEmpty)
        batch.select(col("doc_id").as("k_cluster"), col("doc_id").as("k_doc"), col("quality").as("k_q")).where(lit(false))
      else readKeepers(spark, path, headSeq)

    // matched old docs' member rows — a static-partition-pruned lookup:
    // the touched db buckets (≤ DocBuckets values) become an isin filter
    val oldIds = cross.select(col("od").as("doc_id")).distinct()
    val canonOf = (if (sealedOpt.isEmpty) {
                     batch.select(col("doc_id"), col("quality"), col("doc_id").as("canon")).where(lit(false))
                   } else {
                     val buckets = oldIds.select(docBucket.as("db")).distinct().collect().map(_.getInt(0)).toSeq
                     val members = spark.read.schema(membersSchema).parquet(s"$path/members")
                       .where(col("sq").between(floorOf(spark, path, headSeq), headSeq) && col("db").isin(buckets: _*))
                     members.join(oldIds, "doc_id")
                       .join(alias, members("orig") === col("a_orig"), "left")
                       .select(members("doc_id"), members("quality"), coalesce(col("a_canon"), members("orig")).as("canon"))
                   })
    canonOf.cache(); cached += canonOf

    // contract stored clusters to their canon node; min-label the
    // batch-scale graph (adaptively driver-local under the hood)
    val edges = cross.join(canonOf.select(col("doc_id").as("od"), col("canon")), "od")
      .select(col("nd").as("a"), col("canon").as("b"))
      .unionByName(within)
    val labels = tracked(ConnectedComponents.minLabel(edges))

    val affCanon = canonOf.select(col("canon")).distinct()
      .join(labels, col("canon") === col("node"))
      .select(col("canon"), col("label"))
    affCanon.cache(); cached += affCanon

    // union-find maintenance: remap every alias chain ending in a moved
    // canon, add the moved canons themselves, keep the table identity-free
    val remap = affCanon.where(col("canon") =!= col("label"))
    val aliasNew = alias
      .join(remap.select(col("canon").as("r_c"), col("label").as("r_l")), alias("a_canon") === col("r_c"), "left")
      .select(col("a_orig").as("orig"), coalesce(col("r_l"), col("a_canon")).as("canon"))
      .unionByName(remap.select(col("canon").as("orig"), col("label").as("canon")))
      .where(col("orig") =!= col("canon"))

    // keeper candidates per affected group: old MULTI-cluster keepers,
    // matched old SINGLETONS (no keeper row — they are their own), and
    // the batch's grouped members. Tombstoned docs still RESOLVE canons
    // (their rows stay in canonOf so edges to dead docs work) but are
    // never candidates and were never kept.
    val tomb = if (sealedOpt.isEmpty) spark.range(0).select(col("id").as("t_doc"))
               else readTombstones(spark, path, headSeq)
    val oldKeeperCand = keepers.join(affCanon, col("k_cluster") === col("canon"))
      .select(col("label"), col("k_doc").as("doc_id"), col("k_q").as("quality"))
    val singleCand = tracked(
      canonOf.join(keepers.select(col("k_cluster")), canonOf("canon") === col("k_cluster"), "left_anti")
        .join(broadcast(tomb), canonOf("doc_id") === col("t_doc"), "left_anti")
        .join(affCanon, "canon")
        .select(col("label"), canonOf("doc_id"), canonOf("quality")))
    val newCand = batch.join(labels, batch("doc_id") === col("node"))
      .select(col("label"), batch("doc_id"), col("quality"))
    val wRep = Window.partitionBy("label").orderBy(desc("quality"), col("doc_id"))
    val groupKeeper = tracked(
      oldKeeperCand.unionByName(singleCand).unionByName(newCand)
        .withColumn("rn", row_number().over(wRep)).where(col("rn") === 1)
        .select(col("label").as("cluster"), col("doc_id"), col("quality")))

    val keepersNew = keepers
      .join(affCanon.select(col("canon")), col("k_cluster") === col("canon"), "left_anti")
      .select(col("k_cluster").as("cluster"), col("k_doc").as("doc_id"), col("k_q").as("quality"))
      .unionByName(groupKeeper)

    // changefeed: a (doc, cluster) keep-state that folds exactly —
    // retract every previously-kept pair the seal ends (keeper displaced
    // OR cluster relabeled), assert every kept pair it creates
    val gk = groupKeeper.select(col("cluster").as("g_l"), col("doc_id").as("g_k"))
    val retractMulti = keepers.join(affCanon, col("k_cluster") === col("canon"))
      .join(gk, col("label") === col("g_l"))
      .where(col("label") =!= col("k_cluster") || col("g_k") =!= col("k_doc"))
      .select(lit("retract").as("op"), col("k_doc").as("doc_id"), col("k_cluster").as("cluster"), col("k_q").as("quality"))
    val retractSingle = singleCand
      .join(gk, col("label") === col("g_l"))
      .where(col("label") =!= col("doc_id") || col("g_k") =!= col("doc_id"))
      .select(lit("retract").as("op"), col("doc_id"), col("doc_id").as("cluster"), col("quality"))
    val prevKeptPairs = keepers.select(col("k_cluster").as("cluster"), col("k_doc").as("doc_id"))
      .unionByName(singleCand.select(col("doc_id").as("cluster"), col("doc_id")))
    val assertGroup = groupKeeper.join(prevKeptPairs, Seq("cluster", "doc_id"), "left_anti")
      .select(lit("assert").as("op"), col("doc_id"), col("cluster"), col("quality"))
    val assertIsolated = batch.join(labels, batch("doc_id") === col("node"), "left_anti")
      .select(lit("assert").as("op"), col("doc_id"), col("doc_id").as("cluster"), col("quality"))
    val feed = retractMulti.unionByName(retractSingle).unionByName(assertGroup).unionByName(assertIsolated)

    // new member rows carry the label their cluster has NOW; later
    // merges reach them through the alias, never by rewrite
    val newMembers = batch.join(labels, batch("doc_id") === col("node"), "left")
      .select(batch("doc_id"), col("quality"), coalesce(col("label"), batch("doc_id")).as("orig"))
      .withColumn("db", docBucket)

    // seal: small state + add-log generations first, pointer LAST
    aliasNew.coalesce(1).write.parquet(s"$path/alias-$s")
    keepersNew.coalesce(1).write.parquet(s"$path/keepers-$s")
    feed.coalesce(1).write.parquet(s"$path/feed/sq=$s")
    newMembers.write.partitionBy("db").parquet(s"$path/members/sq=$s")
    bands.write.partitionBy("band").parquet(s"$path/bands/sq=$s")
    batchTag.foreach { tag =>
      fs.create(new Path(s"$path/tag-$s-${tagHash(tag)}"), true).close()
    }
    Ptr.seal(fs, path, s) // create-only: a concurrent sealer of seq s throws here
    // reclaim superseded small state (feed history is retained — it IS
    // the public surface); best-effort, debris is re-swept next update
    sealedOpt.foreach { old =>
      Seq(s"$path/alias-$old", s"$path/keepers-$old", s"$path/_current-$old")
        .foreach(d => fs.delete(new Path(d), true))
    }
    spark.read.parquet(s"$path/feed/sq=$s")
    } finally {
      cached.foreach(df => try { df.unpersist(); () } catch { case _: Throwable => () })
    }
  }

  /** Remove documents from the corpus (ROADMAP 89 — the retention /
    * right-to-be-forgotten side of keep-best dedup, the consumer of
    * [[graft.compact.ManifestCommit.deleteWhere]]'s retraction feed).
    *
    * STICKY-COMPONENT semantics: clusters never split. A removed doc's
    * member and band rows stay (its historical edges keep working — a
    * future near-dup of a dead doc still joins that cluster), but the
    * doc leaves every assignment and every keeper candidacy via a
    * tombstone. That makes the contract exactly oracle-able: cluster
    * over ALL docs ever ingested, rank representatives among SURVIVORS
    * only (`dedup_cluster_rep_retract` pins it in DuckDB).
    *
    * Feed rows: `retract(k, c)` for each cluster whose keeper died,
    * `assert(k', c)` for its recomputed keeper (argmax over surviving
    * members — the ONE read here that is not batch-bounded: members are
    * doc-bucketed, so the survivor lookup is a column-pruned scan
    * filtered to the affected clusters; retention sweeps are rare next
    * to ingest, and the scan touches 3 columns), and `retract(d, d)`
    * for dying kept singletons. Clusters with no survivors just drop
    * their keeper row — a later arrival revives the label. Unknown and
    * already-removed ids are no-ops (replay-idempotent at any seq).
    */
  def retract(spark: SparkSession, path: String, removedIn: DataFrame): DataFrame = {
    val fs = fsOf(spark, path)
    val headSeq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed cluster-rep store at $path"))
    val s = headSeq + 1
    Seq(s"$path/removed/sq=$s", s"$path/alias-$s", s"$path/keepers-$s", s"$path/feed/sq=$s")
      .foreach(d => fs.delete(new Path(d), true))
    val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def tracked(df: DataFrame): DataFrame = { df.cache(); cached += df; df }
    try {
      val ids = tracked(removedIn.select(col("doc_id").cast("long").as("doc_id")).distinct())
      val floor = floorOf(spark, path, headSeq)
      val alias = readAlias(spark, path, headSeq)
      val keepers = tracked(readKeepers(spark, path, headSeq))
      val tomb = tracked(readTombstones(spark, path, headSeq))
      val buckets = ids.select(docBucket.as("db")).distinct().collect().map(_.getInt(0)).toSeq
      val lookup = spark.read.schema(membersSchema).parquet(s"$path/members")
        .where(col("sq").between(floor, headSeq) && col("db").isin(buckets: _*))
      // the docs actually dying NOW: known member rows, not yet tombstoned
      val rem = tracked(
        lookup.join(ids, "doc_id")
          .join(broadcast(tomb), lookup("doc_id") === col("t_doc"), "left_anti")
          .join(alias, lookup("orig") === col("a_orig"), "left")
          .select(lookup("doc_id"), lookup("quality"), coalesce(col("a_canon"), lookup("orig")).as("canon")))

      // clusters losing their KEEPER need a recompute over survivors
      val deadKeeper = tracked(
        rem.join(keepers, rem("canon") === col("k_cluster") && rem("doc_id") === col("k_doc"))
          .select(rem("canon"), col("k_doc"), col("k_q")))
      val allMembers = spark.read.schema(membersSchema).parquet(s"$path/members")
        .where(col("sq").between(floor, headSeq))
      val resolved = allMembers
        .join(alias, allMembers("orig") === col("a_orig"), "left")
        .select(allMembers("doc_id"), allMembers("quality"), coalesce(col("a_canon"), allMembers("orig")).as("canon"))
      val goneNow = rem.select(col("doc_id").as("t_doc"))
        .unionByName(tomb).distinct()
      val survivors = resolved
        .join(broadcast(deadKeeper.select(col("canon"))), Seq("canon"))
        .join(broadcast(goneNow), resolved("doc_id") === col("t_doc"), "left_anti")
      val wRep = Window.partitionBy("canon").orderBy(desc("quality"), col("doc_id"))
      val newKeepers = tracked(
        survivors.withColumn("rn", row_number().over(wRep)).where(col("rn") === 1)
          .select(col("canon").as("cluster"), col("doc_id"), col("quality")))

      val keepersNew = keepers
        .join(broadcast(deadKeeper.select(col("canon"))), col("k_cluster") === col("canon"), "left_anti")
        .select(col("k_cluster").as("cluster"), col("k_doc").as("doc_id"), col("k_q").as("quality"))
        .unionByName(newKeepers)

      // dying kept singletons: a rem doc whose cluster has NO keeper row
      // is an unmatched singleton (any revived or multi cluster carries
      // one) — it was implicitly kept as (d, d)
      val deadSingle = rem.join(keepers.select(col("k_cluster")), rem("canon") === col("k_cluster"), "left_anti")
      val feed = deadKeeper
        .select(lit("retract").as("op"), col("k_doc").as("doc_id"), col("canon").as("cluster"), col("k_q").as("quality"))
        .unionByName(newKeepers
          .select(lit("assert").as("op"), col("doc_id"), col("cluster"), col("quality")))
        .unionByName(deadSingle
          .select(lit("retract").as("op"), rem("doc_id"), rem("doc_id").as("cluster"), rem("quality")))

      rem.select(col("doc_id")).coalesce(1).write.parquet(s"$path/removed/sq=$s")
      aliasNewCopy(spark, path, headSeq).coalesce(1).write.parquet(s"$path/alias-$s")
      keepersNew.coalesce(1).write.parquet(s"$path/keepers-$s")
      feed.coalesce(1).write.parquet(s"$path/feed/sq=$s")
      Ptr.seal(fs, path, s)
      Seq(s"$path/alias-$headSeq", s"$path/keepers-$headSeq", s"$path/_current-$headSeq")
        .foreach(d => fs.delete(new Path(d), true))
      spark.read.parquet(s"$path/feed/sq=$s")
    } finally {
      cached.foreach(df => try { df.unpersist(); () } catch { case _: Throwable => () })
    }
  }

  private def aliasNewCopy(spark: SparkSession, path: String, seq: Long): DataFrame =
    readAlias(spark, path, seq).select(col("a_orig").as("orig"), col("a_canon").as("canon"))

  /** The store's full current assignment: (doc_id, cluster, keep) —
    * definitionally equal to the one-shot `dedup_cluster_rep` on the
    * union of every absorbed batch (the spec's randomized pin; with
    * retractions, components over ALL docs and reps among survivors).
    */
  def assignment(spark: SparkSession, path: String): DataFrame = {
    val headSeq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed cluster-rep store at $path"))
    val members = spark.read.schema(membersSchema).parquet(s"$path/members")
      .where(col("sq").between(floorOf(spark, path, headSeq), headSeq))
      .join(broadcast(readTombstones(spark, path, headSeq)), col("doc_id") === col("t_doc"), "left_anti")
    val alias = readAlias(spark, path, headSeq)
    val keepers = readKeepers(spark, path, headSeq)
    members.join(alias, members("orig") === col("a_orig"), "left")
      .withColumn("cluster", coalesce(col("a_canon"), members("orig")))
      .join(keepers.select(col("k_cluster").as("cluster"), col("k_doc")), Seq("cluster"), "left")
      .select(
        col("doc_id"),
        col("cluster"),
        when(col("k_doc").isNull || col("k_doc") === col("doc_id"), 1).otherwise(0).as("keep"),
      )
  }

  /** The retained changefeed, every seal: (sq, op, doc_id, cluster,
    * quality). Folding asserts minus retracts up to any sealed sq
    * reproduces that seal's kept pairs.
    */
  def feed(spark: SparkSession, path: String): DataFrame = {
    val headSeq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed cluster-rep store at $path"))
    spark.read.parquet(s"$path/feed").where(col("sq") <= headSeq)
  }

  /** Live members/bands generations: `floor ≤ sq ≤ sealed`. The floor
    * is how [[compact]] retires folded generations without an in-place
    * swap: a fold seals a NEW generation holding every live row and a
    * `floor-<seq>` marker; readers below the pointer never see the fold
    * until the pointer flips, and after it they never see the folded-
    * away dirs — every crash window reads exactly one edition.
    */
  private def floorOf(spark: SparkSession, path: String, sealedSeq: Long): Long = {
    val fs = fsOf(spark, path)
    val re = "floor-(\\d+)".r
    fs.listStatus(new Path(path))
      .flatMap(e => re.findFirstMatchIn(e.getPath.getName).map(_.group(1).toLong))
      .filter(_ <= sealedSeq).sorted.lastOption.getOrElse(1L)
  }

  /** Live add-log generations — the fragmentation dial
    * [[StoreMaintenance.maintainClusterRep]] watches: every update adds
    * one members + one bands generation, and each history screen unions
    * a scan per generation.
    */
  def generationCount(spark: SparkSession, path: String): Long = {
    val headSeq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed cluster-rep store at $path"))
    headSeq - floorOf(spark, path, headSeq) + 1
  }

  /** Fold every live members/bands generation into one (rows unchanged,
    * one file per partition), sealed as generation `sealed+1` with a
    * floor marker — probe-equal to the unfolded store, pinned by
    * ClusterRepStoreSpec. The changefeed history keeps its sq dirs: it
    * is the public log, not derivable state.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val headSeq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed cluster-rep store at $path"))
    val floor = floorOf(spark, path, headSeq)
    val s = headSeq + 1
    Seq(s"$path/members/sq=$s", s"$path/bands/sq=$s", s"$path/alias-$s", s"$path/keepers-$s", s"$path/floor-$s", s"$path/removed/sq=$s")
      .foreach(d => fs.delete(new Path(d), true))
    val mem = spark.read.schema(membersSchema).parquet(s"$path/members")
      .where(col("sq").between(floor, headSeq))
    mem.drop("sq").repartition(col("db"))
      .write.partitionBy("db").parquet(s"$path/members/sq=$s")
    val bnd = spark.read.schema(bandsSchema).parquet(s"$path/bands")
      .where(col("sq").between(floor, headSeq))
    bnd.drop("sq").repartition(col("band"))
      .write.partitionBy("band").parquet(s"$path/bands/sq=$s")
    // small state carries forward unchanged under the new seq —
    // including the tombstones: member/band rows of dead docs are kept
    // (historical edges), so the exclusion set must survive the fold
    val tombs = readTombstones(spark, path, headSeq)
    if (tombs.limit(1).count() > 0)
      tombs.select(col("t_doc").as("doc_id")).coalesce(1).write.parquet(s"$path/removed/sq=$s")
    readAlias(spark, path, headSeq).select(col("a_orig").as("orig"), col("a_canon").as("canon"))
      .coalesce(1).write.parquet(s"$path/alias-$s")
    readKeepers(spark, path, headSeq)
      .select(col("k_cluster").as("cluster"), col("k_doc").as("doc_id"), col("k_q").as("quality"))
      .coalesce(1).write.parquet(s"$path/keepers-$s")
    fs.create(new Path(s"$path/floor-$s"), true).close()
    Ptr.seal(fs, path, s) // create-only: a concurrent sealer of seq s throws here
    // reclaim every pre-fold generation (including stragglers a
    // crashed earlier reclaim left behind) and superseded small state
    Seq("members", "bands", "removed").foreach { sub =>
      val base = new Path(s"$path/$sub")
      if (fs.exists(base)) fs.listStatus(base).foreach { e =>
        val n = e.getPath.getName
        if (n.startsWith("sq=") && n.stripPrefix("sq=").toLongOption.exists(_ < s))
          fs.delete(e.getPath, true)
      }
    }
    Seq(s"$path/alias-$headSeq", s"$path/keepers-$headSeq", s"$path/_current-$headSeq")
      .foreach(d => fs.delete(new Path(d), true))
    val re = "floor-(\\d+)".r
    fs.listStatus(new Path(path)).foreach { e =>
      re.findFirstMatchIn(e.getPath.getName).map(_.group(1).toLong).filter(_ < s)
        .foreach(_ => fs.delete(e.getPath, true))
    }
  }
}
