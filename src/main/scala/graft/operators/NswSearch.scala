package graft.operators

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-index ANN: a navigable-small-world graph PER PARTITION, built
  * and searched inside `mapPartitions` — the single-layer core of HNSW
  * (Malkov & Yashunin 2016) without the hierarchy (layer 0 is where all
  * the recall lives; the hierarchy only trims the entry path, which a
  * few random entry points approximate at partition sizes).
  *
  * Why a third ANN family next to sign-LSH and IVF: bucket methods bound
  * candidates by a PARTITION OF SPACE, so recall collapses for queries
  * near bucket boundaries; a greedy graph walk bounds candidates by
  * CONNECTIVITY and degrades smoothly — the standard quality/latency
  * point production vector search runs at.
  *
  * Scale shape: the corpus never shuffles — each task builds its
  * partition's graph (O(n·efBuild·M) local work, memory O(n·M) ids) and
  * answers the whole broadcast query batch against it (O(B·efSearch·M)
  * per task, amortizing the build over B queries); only the per-task
  * top-k rows move (≤ B·k·tasks, the same WindowGroupLimit merge as
  * every kNN join here).
  *
  * Determinism: insertion order is partition row order, ties in the
  * search frontier break on (sim desc, id asc), so the result is a pure
  * function of (data, partitioning, parameters) — witnessed by
  * AnnSearchSpec alongside the recall floors and the efSearch
  * monotonicity law.
  */
object NswSearch {

  /** Drain a result heap to a best-first list (sim desc, id asc). */
  private def drain(pq: mutable.PriorityQueue[(Double, Int)]): List[(Double, Int)] = {
    var out = List.empty[(Double, Int)]
    while (pq.nonEmpty) out = pq.dequeue() :: out
    out.sortBy(t => (-t._1, t._2))
  }

  private def cosine(a: Array[Double], b: Array[Double]): Double =
    VecMath.cosineOrZero(a, b)

  /** Greedy best-first walk over the adjacency lists: expand the most
    * similar frontier node, keep the best `ef` seen; stop when the
    * frontier's best cannot improve the worst of the kept set.
    */
  private def searchGraph(
      vs: Array[Array[Double]],
      adj: Array[mutable.ArrayBuffer[Int]],
      entries: Seq[Int],
      q: Array[Double],
      ef: Int,
  ): mutable.PriorityQueue[(Double, Int)] = {
    // kept: min-heap by sim (worst on top) — bounded to ef
    val kept = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), (Double, Int)] { case (s, i) => (-s, i) },
    )
    // frontier: max-heap by sim (best first; id asc tiebreak)
    val frontier = mutable.PriorityQueue.empty[(Double, Int)](
      Ordering.by[(Double, Int), (Double, Int)] { case (s, i) => (s, -i) },
    )
    val visited = mutable.BitSet.empty
    entries.foreach { e =>
      if (!visited.contains(e)) {
        visited += e
        val s = cosine(vs(e), q)
        frontier.enqueue((s, e))
        kept.enqueue((s, e))
        if (kept.size > ef) { kept.dequeue(); () }
      }
    }
    while (frontier.nonEmpty) {
      val (bestSim, node) = frontier.dequeue()
      if (kept.size >= ef && bestSim < kept.head._1) return kept // can't improve
      adj(node).foreach { nb =>
        if (!visited.contains(nb)) {
          visited += nb
          val s = cosine(vs(nb), q)
          if (kept.size < ef || s > kept.head._1) {
            frontier.enqueue((s, nb))
            kept.enqueue((s, nb))
            if (kept.size > ef) { kept.dequeue(); () }
          }
        }
      }
    }
    kept
  }

  /** Incremental build: each node greedy-searches the graph-so-far for
    * its `m` nearest and links bidirectionally; degree capped at `2m`
    * keeping the most similar (the HNSW neighbor-selection simplified to
    * distance order).
    */
  private def buildGraph(
      vs: Array[Array[Double]],
      m: Int,
      efBuild: Int,
  ): Array[mutable.ArrayBuffer[Int]] = {
    val n = vs.length
    val adj = Array.fill(n)(mutable.ArrayBuffer.empty[Int])
    val maxDeg = 2 * m
    def cap(node: Int): Unit =
      if (adj(node).size > maxDeg) {
        val kept = adj(node).sortBy(nb => (-cosine(vs(node), vs(nb)), nb)).take(maxDeg)
        adj(node).clear()
        adj(node) ++= kept
        ()
      }
    var i = 1
    while (i < n) {
      val found = drain(searchGraph(vs, adj, Seq(0), vs(i), math.max(m, efBuild))).take(m)
      found.foreach { case (_, nb) =>
        adj(i) += nb
        adj(nb) += i
        cap(nb)
      }
      cap(i)
      i += 1
    }
    adj
  }

  // ------------------------------------------------------------------
  // Persisted index: versioned layout with a shard-ownership map
  // ------------------------------------------------------------------

  /** Persisted form of the per-partition graph: one row per node with
    * its partition, insertion ordinal, payload, and neighbor ORDINALS
    * (partition-local, so the row is self-contained and compact). The
    * index table replaces the O(n·efBuild·M) build on every query
    * batch with a scan — BandsStore's persisted-candidates pattern
    * applied to the graph family.
    *
    * Durability (the [[IvfStore]] crash contract, extended to
    * partial-rewrite maintenance):
    *
    *   - `path/_current-<seq>`: empty pointer, CREATED LAST
    *     (create-if-absent — doubling as the concurrent-writer
    *     tripwire). Readers resolve the highest pointer; a crash
    *     anywhere before it leaves the previous version live and
    *     search-identical.
    *   - `path/v<seq>/_map`: the shard-ownership map sealed by that
    *     pointer — one `shard.<id>=<ownerSeq>` line per LIVE shard
    *     naming the version dir that last rewrote it, plus
    *     `centroids=<ownerSeq>` for routed stores. The map is what lets
    *     [[insertIndex]]/[[rebalanceIndex]] write ONLY the touched
    *     shards into the new version dir (no copy of untouched data —
    *     object-store-friendly at any shard count) while still
    *     committing atomically: untouched shards keep their old files,
    *     referenced in place.
    *   - `path/v<seq>/part=<id>/`: the shard data rewritten AT that
    *     seq; `path/v<seq>/_centroids/` when that seq (re)trained the
    *     coarse quantizer. Both are written before the map, which is
    *     written before the pointer — so the pointer always names a
    *     complete, internally-consistent version (shards can never be
    *     routed by centroids from a different generation, the failure
    *     mode `IvfStore` documents at its `:19-27`).
    *
    * Reclaim runs only after the seal: version dirs below the head
    * keep exactly the shard dirs the current map still references;
    * fully-superseded dirs are deleted.
    */
  final case class IndexRow(
      part: Int,
      ord: Int,
      vec_id: Long,
      label: String,
      v: Array[Double],
      nbrs: Array[Int],
  )

  /** Shard-ownership map of one sealed version: which version dir owns
    * each live shard (and the centroid table, for routed stores).
    */
  private[operators] final case class ShardMap(centroids: Option[Long], shards: Map[Int, Long])

  private val Ptr = graft.compact.VersionedPointer.Current

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def vdirOf(path: String, seq: Long) = s"$path/v$seq"
  private def mapPath(path: String, seq: Long) = new Path(s"${vdirOf(path, seq)}/_map")
  private def centroidsDir(path: String, ownerSeq: Long) = s"${vdirOf(path, ownerSeq)}/_centroids"

  /** Highest sealed version seq, if any build ever committed here. */
  private def currentSeq(fs: FileSystem, path: String): Option[Long] =
    Ptr.resolve(fs, path)

  private def resolveSeq(fs: FileSystem, path: String): Long =
    currentSeq(fs, path).getOrElse(
      throw new IllegalStateException(s"no sealed NSW index at $path (crashed or missing build — re-run buildIndex)"),
    )

  /** Read the sealed shard map of version `seq` — loud on a torn or
    * missing map (a sealed pointer without its map is corruption, not a
    * crash window: the map is written first).
    */
  private def readMap(fs: FileSystem, path: String, seq: Long): ShardMap = {
    val p = mapPath(path, seq)
    if (!fs.exists(p))
      throw new IllegalStateException(s"sealed NSW version v$seq at $path has no _map — store is corrupt")
    val in = fs.open(p)
    val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val lines = text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    val centroids = lines.collectFirst { case s if s.startsWith("centroids=") => s.stripPrefix("centroids=").toLong }
    val shards = lines.collect {
      case s if s.startsWith("shard.") =>
        val Array(k, v) = s.stripPrefix("shard.").split("=", 2)
        k.toInt -> v.toLong
    }.toMap
    require(shards.nonEmpty, s"NSW _map at $path/v$seq lists no shards — store is corrupt")
    ShardMap(centroids, shards)
  }

  /** Seal version `seq`: write the map INSIDE the version dir, create
    * the pointer (create-if-absent — the commit point), then reclaim
    * superseded data. Pointer-last means the highest sealed pointer
    * always names a complete version, whatever the reclaim got through.
    */
  private def seal(fs: FileSystem, path: String, seq: Long, map: ShardMap): Unit = {
    val out = fs.create(mapPath(path, seq), true)
    val text = (map.centroids.map(s => s"centroids=$s").toSeq ++
      map.shards.toSeq.sortBy(_._1).map { case (k, v) => s"shard.$k=$v" }).mkString("\n")
    try out.write(text.getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    Ptr.seal(fs, path, seq)
    reclaim(fs, path, seq, map)
  }

  /** Best-effort reclaim after a seal: old pointers go; version dirs
    * below `seq` keep only the shard dirs (and centroid table) the new
    * map still references, and vanish entirely once nothing references
    * them. Single-writer maintenance contract, like [[IvfStore]]'s.
    */
  private def reclaim(fs: FileSystem, path: String, seq: Long, map: ShardMap): Unit = {
    def rm(p: Path): Unit = { try fs.delete(p, true) catch { case _: Throwable => () }; () }
    fs.listStatus(new Path(path)).foreach { st =>
      val n = st.getPath.getName
      if (st.isFile && Ptr.seqOf(n).exists(_ < seq)) rm(st.getPath)
      else if (st.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toLong < seq) {
        val old = n.drop(1).toLong
        val owned = map.shards.collect { case (id, o) if o == old => id }.toSet
        val keepCentroids = map.centroids.contains(old)
        if (owned.isEmpty && !keepCentroids) rm(st.getPath)
        else
          fs.listStatus(st.getPath).foreach { sub =>
            val sn = sub.getPath.getName
            val keep =
              (sn.startsWith("part=") && sn.stripPrefix("part=").toIntOption.exists(owned.contains)) ||
                (sn == "_centroids" && keepCentroids)
            if (!keep) rm(sub.getPath)
          }
      }
    }
  }

  /** List the `part=<id>` shard ids a write just produced under `vdir`. */
  private def writtenShards(fs: FileSystem, vdir: String): Seq[Int] =
    fs.listStatus(new Path(vdir))
      .flatMap(st => if (st.isDirectory) st.getPath.getName.stripPrefix("part=").toIntOption else None)
      .toSeq.sorted

  /** Read live shard rows (optionally restricted to `only` shard ids):
    * shards group by owner version and each group reads its CONCRETE
    * `part=` dirs (basePath keeps the partition column) — restriction
    * is path-level pruning, never a post-scan filter.
    */
  private[operators] def readShards(spark: SparkSession, path: String, only: Option[Set[Int]]): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    val map = readMap(fs, path, resolveSeq(fs, path))
    val wanted = only.map(ids => map.shards.view.filterKeys(ids.contains).toMap).getOrElse(map.shards)
    val cols = Seq(col("part").cast("int").as("part"), col("ord"), col("vec_id"), col("label"), col("v"), col("nbrs"))
    if (wanted.isEmpty) spark.emptyDataset[IndexRow].toDF().select(cols: _*)
    else
      wanted.groupBy(_._2).toSeq.sortBy(_._1).map { case (owner, byShard) =>
        val vdir = vdirOf(path, owner)
        val dirs = byShard.keys.toSeq.sorted.map(id => s"$vdir/part=$id")
        spark.read.option("basePath", vdir).parquet(dirs: _*).select(cols: _*)
      }.reduce(_.unionByName(_))
  }

  /** The whole live index as one frame — the reader tools and specs use
    * (layout-agnostic: callers never touch version dirs directly).
    */
  def readIndex(spark: SparkSession, path: String): DataFrame = readShards(spark, path, None)

  /** Live shard → owning version seq (metadata-only — one small `_map`
    * read; specs and maintenance dials consume it).
    */
  def shardOwners(spark: SparkSession, path: String): Map[Int, Long] = {
    val fs = fsOf(spark, path)
    readMap(fs, path, resolveSeq(fs, path)).shards
  }

  /** Number of distinct version dirs the live map references — the
    * indirection [[compactIndex]] folds away.
    */
  def versionSpread(spark: SparkSession, path: String): Int = {
    val fs = fsOf(spark, path)
    val map = readMap(fs, path, resolveSeq(fs, path))
    (map.shards.values.toSet ++ map.centroids).size
  }

  /** Build the per-partition graphs ONCE and write them as a versioned
    * parquet index at `path`. Graphs are identical to what [[nsw]]
    * builds on the same partitioning of `e`; re-building bumps the
    * version (pointer seals last, superseded versions reclaimed).
    */
  def buildIndex(e: DataFrame, path: String, m: Int = 8, efBuild: Int = 24): Unit = {
    val spark = e.sparkSession
    import spark.implicits._
    val fs = fsOf(spark, path)
    val seq = currentSeq(fs, path).getOrElse(0L) + 1L
    val vdir = vdirOf(path, seq)
    e.select(col("vec_id"), col("label"), col("v"))
      .as[(Long, String, Array[Double])]
      .mapPartitions { it =>
        val part = org.apache.spark.TaskContext.getPartitionId()
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val adj = buildGraph(rows.map(_._3), m, efBuild)
          rows.iterator.zipWithIndex.map { case ((id, label, v), ord) =>
            IndexRow(part, ord, id, label, v, adj(ord).toArray)
          }
        }
      }
      // overwrite: a crashed unsealed attempt at this seq is safely redone
      .write.mode("overwrite").partitionBy("part").parquet(vdir)
    seal(fs, path, seq, ShardMap(None, writtenShards(fs, vdir).map(_ -> seq).toMap))
  }

  /** Incremental insert into a persisted index: each new vector is
    * routed to a shard by hash, greedy-linked into that shard's stored
    * graph exactly as a fresh build would link it (same search, same m
    * nearest, same bidirectional edges and degree cap), and ONLY the
    * touched shards are rewritten — into a NEW version dir, with
    * untouched shards carried by reference in the sealed map (their
    * files are never rewritten OR copied). Insertion order within a
    * shard is the stored ordinal order followed by new-vector id order,
    * so repeated inserts are deterministic; a crash anywhere before the
    * pointer leaves the previous version live.
    *
    * `rebalanceMax` > 0 additionally runs [[rebalanceIndex]] after the
    * insert, so a long-lived index keeps its per-shard search cost
    * bounded without a separate maintenance pass; 0 (default) leaves
    * maintenance to the caller.
    */
  def insertIndex(spark: SparkSession, path: String, newDocs: DataFrame, m: Int = 8, efBuild: Int = 24, rebalanceMax: Int = 0): Unit = {
    val fs = fsOf(spark, path)
    val map = readMap(fs, path, resolveSeq(fs, path))
    // pmod routing domain: the map's contiguous 0..nParts-1 shard ids
    val nParts = map.shards.keys.max + 1
    val routed = newDocs
      .select(col("vec_id"), col("label"), col("v"))
      .withColumn("part", pmod(col("vec_id"), lit(nParts.toLong)).cast("int"))
    insertRoutedRows(spark, path, routed, m, efBuild)
    if (rebalanceMax > 0) { rebalanceIndex(spark, path, rebalanceMax, m, efBuild); () }
  }

  /** Shared insert kernel: `routed` carries `(vec_id, label, v, part)`
    * with the shard already chosen (hash for [[insertIndex]], coarse
    * quantizer for [[insertIndexRouted]]); each new vector greedy-links
    * into its shard's stored graph, the rewritten shards land in a
    * fresh version dir, and the sealed map re-points ONLY them.
    */
  private def insertRoutedRows(spark: SparkSession, path: String, routed: DataFrame, m: Int, efBuild: Int): Unit = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    val seq = resolveSeq(fs, path)
    val map = readMap(fs, path, seq)
    val touched = routed.select("part").distinct().as[Int].collect().toSet
    val existing = readShards(spark, path, Some(touched)).as[IndexRow]
    val newRows = routed.select("vec_id", "label", "v", "part").as[(Long, String, Array[Double], Int)]
    val rewritten = existing
      .groupByKey(_.part)
      .cogroup(newRows.groupByKey(_._4)) { (part, oldIt, newIt) =>
        val olds = oldIt.toArray.sortBy(_.ord)
        val news = newIt.toArray.sortBy(_._1)
        val vs = mutable.ArrayBuffer.from(olds.map(_.v))
        val adj = mutable.ArrayBuffer.from(olds.map(r => mutable.ArrayBuffer.from(r.nbrs)))
        val ids = mutable.ArrayBuffer.from(olds.map(r => (r.vec_id, r.label)))
        val maxDeg = 2 * m
        def cap(node: Int): Unit =
          if (adj(node).size > maxDeg) {
            val kept = adj(node).sortBy(nb => (-cosine(vs(node), vs(nb)), nb)).take(maxDeg)
            adj(node).clear(); adj(node) ++= kept
            ()
          }
        news.foreach { case (id, label, v, _) =>
          val i = vs.length
          vs += v; ids += ((id, label)); adj += mutable.ArrayBuffer.empty[Int]
          if (i > 0) {
            val found = drain(searchGraph(vs.toArray, adj.toArray, Seq(0), v, math.max(m, efBuild))).take(m)
            found.foreach { case (_, nb) => adj(i) += nb; adj(nb) += i; cap(nb) }
            cap(i)
          }
        }
        ids.indices.iterator.map { i =>
          IndexRow(part, i, ids(i)._1, ids(i)._2, vs(i), adj(i).toArray)
        }
      }
    val newSeq = seq + 1L
    val vNew = vdirOf(path, newSeq)
    rewritten.toDF().write.mode("overwrite").partitionBy("part").parquet(vNew)
    val written = writtenShards(fs, vNew)
    seal(fs, path, newSeq, map.copy(shards = map.shards ++ written.map(_ -> newSeq)))
  }

  /** Bound per-task search cost for a long-lived index:
    * [[insertIndex]]'s hash routing can skew shard sizes over many
    * appends, and an oversized shard makes every query batch pay its
    * O(n·M) walk. Split every shard holding more than `maxNodes`
    * vectors into ceil(n/maxNodes) chunks of stored-ordinal order —
    * the first chunk keeps the shard id, the rest take fresh ids past
    * the current maximum (so [[insertIndex]]'s pmod routing domain
    * stays contiguous 0..nParts-1) — rebuild each chunk's graph with
    * the same deterministic build as [[buildIndex]], and rewrite ONLY
    * the touched shards (into a fresh version dir, untouched shards
    * carried by reference — the insert discipline). A pure function of
    * the stored index: repeated rebalances are deterministic, and a
    * rebalance with every shard within bound is a no-op. Returns the
    * number of shards split.
    *
    * Recall is preserved, not traded: every shard still answers every
    * query and the per-shard top-k merge is unchanged — more shards
    * mean more entry points, smaller graphs, and the same ≤ B·k·tasks
    * merge rows. Scale shape: only oversized shards' rows move (one
    * grouping shuffle), each chunk rebuild is task-local.
    */
  def rebalanceIndex(spark: SparkSession, path: String, maxNodes: Int, m: Int = 8, efBuild: Int = 24): Int = {
    require(maxNodes > 0, s"maxNodes must be positive: $maxNodes")
    import spark.implicits._
    val fs = fsOf(spark, path)
    val seq = resolveSeq(fs, path)
    val map = readMap(fs, path, seq)
    val sizes = readShards(spark, path, None)
      .groupBy(col("part")).count()
      .as[(Int, Long)].collect().sortBy(_._1)
    require(sizes.nonEmpty, s"no index shards at $path")
    val oversized = sizes.filter(_._2 > maxNodes)
    if (oversized.isEmpty) return 0
    // fresh ids for every chunk after the first, assigned in shard order
    var nextId = map.shards.keys.max + 1
    val chunkIds: Map[Int, Seq[Int]] = oversized.map { case (part, n) =>
      val chunks = ((n + maxNodes - 1) / maxNodes).toInt
      val ids = part +: (0 until chunks - 1).map(i => nextId + i)
      nextId += chunks - 1
      part -> ids
    }.toMap
    val touched = chunkIds.keySet
    val rewritten = readShards(spark, path, Some(touched))
      .as[IndexRow]
      .groupByKey(_.part)
      .flatMapGroups { (part, it) =>
        val rows = it.toArray.sortBy(_.ord)
        val ids = chunkIds(part)
        val chunkSize = (rows.length + ids.length - 1) / ids.length
        rows.grouped(chunkSize).zip(ids.iterator).flatMap { case (chunk, id) =>
          val adj = buildGraph(chunk.map(_.v), m, efBuild)
          chunk.iterator.zipWithIndex.map { case (r, ord) =>
            IndexRow(id, ord, r.vec_id, r.label, r.v, adj(ord).toArray)
          }
        }
      }
    val newSeq = seq + 1L
    val vNew = vdirOf(path, newSeq)
    rewritten.toDF().write.mode("overwrite").partitionBy("part").parquet(vNew)
    val written = writtenShards(fs, vNew)
    seal(fs, path, newSeq, map.copy(shards = map.shards ++ written.map(_ -> newSeq)))
    oversized.length
  }

  /** Fold the live index into ONE fresh version dir (rows unchanged, no
    * graph rebuild): long maintenance chains leave the map pointing
    * into many version dirs — correct, but every reader resolution
    * unions that many scans, and fully-superseded dirs only die when
    * their last shard is re-pointed. The fold rewrites every live shard
    * (and the centroid table, when routed) under one seq and seals —
    * after it, exactly one version dir exists. The [[IvfStore.compactLists]]
    * shape for the graph store.
    */
  def compactIndex(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val seq = resolveSeq(fs, path)
    val map = readMap(fs, path, seq)
    val newSeq = seq + 1L
    val vNew = vdirOf(path, newSeq)
    readShards(spark, path, None)
      .repartition(col("part"))
      .write.mode("overwrite").partitionBy("part").parquet(vNew)
    val cents = map.centroids.map { owner =>
      spark.read.parquet(centroidsDir(path, owner))
        .write.mode("overwrite").parquet(s"$vNew/_centroids")
      newSeq
    }
    val written = writtenShards(fs, vNew)
    seal(fs, path, newSeq, ShardMap(cents, written.map(_ -> newSeq).toMap))
  }

  /** Search a persisted index: one shuffle groups each partition's rows
    * back together (cheap relative to the build it replaces — pure data
    * movement, no cosine passes), the adjacency arrays are reassembled
    * in insertion order, and the query batch runs the same greedy walk
    * as [[nsw]]. Same results as building fresh on the same
    * partitioning (NswIndexSpec pins the equality).
    */
  def searchIndex(spark: SparkSession, path: String, queries: Seq[(Long, Array[Double])], k: Int, efSearch: Int = 48, m: Int = 8): DataFrame = {
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(queries.toArray)
    val local = readShards(spark, path, None)
      .as[IndexRow]
      .groupByKey(_.part)
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_.ord)
        val vs = rows.map(_.v)
        val adj = rows.map(r => mutable.ArrayBuffer.from(r.nbrs))
        val entries = 0 until rows.length by math.max(1, rows.length / math.max(1, m))
        qB.value.iterator.flatMap { case (qid, qv) =>
          drain(searchGraph(vs, adj, entries, qv, efSearch))
            .iterator
            .filter { case (_, i) => rows(i).vec_id != qid }
            .take(k)
            .map { case (s, i) => (qid, rows(i).vec_id, rows(i).label, s) }
        }
      }
      .toDF("qid", "vec_id", "label", "sim")
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    local
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("label"), col("sim"))
  }

  /** CENTROID-ROUTED shard layout: shard assignment by a coarse
    * quantizer (the [[IvfStore]] codebook recipe — deterministic Lloyd,
    * seeds = lowest vec_ids) instead of `pmod(vec_id)`. Hash routing
    * spreads every neighborhood across every shard, so [[searchIndex]]
    * must probe ALL shards per query batch; routing by nearest centroid
    * co-locates neighborhoods, and [[searchIndexRouted]] probes only
    * each query's `nprobe` nearest shards — the IvfStore partition-
    * pruning property, with an NSW graph walk instead of a list scan
    * inside each probed shard. Per-shard graphs are built with the
    * exact [[buildIndex]] kernel (insertion order = vec_id asc for
    * determinism); centroids persist INSIDE the version dir
    * (`v<seq>/_centroids`, underscore-hidden from the shard reads) and
    * are sealed by the same pointer as the shards they route — a crash
    * can never pair shards with centroids from a different generation.
    *
    * Trade-offs vs hash routing, both kept on purpose:
    * [[insertIndex]]'s pmod routing needs no centroid lookup and keeps
    * working after [[rebalanceIndex]] widens the shard domain; routed
    * shards answer small query batches at nprobe/nShards of the scan
    * cost but pay one coarse-quantizer training at build time and skew
    * with data drift (rebuild via [[rebuildRouted]] when
    * [[IvfStore.needsRetrain]]-style skew appears — an ordinal
    * rebalance would orphan the centroid map).
    */
  def buildIndexRouted(
      e: DataFrame,
      path: String,
      nShards: Int = 8,
      m: Int = 8,
      efBuild: Int = 24,
      lloydIters: Int = 2,
      seedIds: Option[Seq[Long]] = None,
  ): Unit = {
    val spark = e.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val fs = fsOf(spark, path)
    val seq = currentSeq(fs, path).getOrElse(0L) + 1L
    val vdir = vdirOf(path, seq)
    val cb = IvfStore.train(e, nShards, lloydIters, seedIds).cache()
    try {
      IvfStore.assign(e, cb)
        .select(col("vec_id"), col("label"), col("v"), col("cid").cast("int").as("part"))
        .as[(Long, String, Array[Double], Int)]
        .groupByKey(_._4)
        .flatMapGroups { (part, it) =>
          val rows = it.toArray.sortBy(_._1) // vec_id asc: deterministic insertion order
          val adj = buildGraph(rows.map(_._3), m, efBuild)
          rows.iterator.zipWithIndex.map { case ((id, label, v, _), ord) =>
            IndexRow(part, ord, id, label, v, adj(ord).toArray)
          }
        }
        .write.mode("overwrite").partitionBy("part").parquet(vdir)
      // centroids AFTER the shard write (overwrite above would wipe
      // them) and BEFORE the seal — the pointer commits both together
      cb.write.mode("overwrite").parquet(s"$vdir/_centroids")
      seal(fs, path, seq, ShardMap(Some(seq), writtenShards(fs, vdir).map(_ -> seq).toMap))
    } finally { cb.unpersist(); () }
  }

  /** Rebuild a ROUTED store from its own live rows: retrain the coarse
    * quantizer (same shard count unless overridden) and rebuild every
    * shard graph — the skew remedy for drifted routed stores, since an
    * ordinal split would orphan the centroid map. [[buildIndex]]'s
    * crash discipline: the new version seals atomically over the old.
    */
  def rebuildRouted(
      spark: SparkSession,
      path: String,
      nShards: Int = 0, // 0 → keep the store's current centroid count
      m: Int = 8,
      efBuild: Int = 24,
      lloydIters: Int = 2,
  ): Unit = {
    val fs = fsOf(spark, path)
    val map = readMap(fs, path, resolveSeq(fs, path))
    val owner = map.centroids.getOrElse(
      throw new IllegalStateException(s"$path is not a routed index (no centroids) — use buildIndexRouted first"),
    )
    val k =
      if (nShards > 0) nShards
      else spark.read.parquet(centroidsDir(path, owner)).count().toInt
    // lazy reads over the CURRENT version's files: buildIndexRouted
    // writes a fresh version dir and reclaims this one only after its
    // pointer seals, so the scan below reads stable files throughout
    val corpus = readShards(spark, path, None).select(col("vec_id"), col("label"), col("v"))
    buildIndexRouted(corpus, path, k, m, efBuild, lloydIters)
  }

  /** Search a centroid-routed index: rank shards per query against the
    * collected K-row centroid table (driver-side, the [[IvfStore.search]]
    * discipline), scan ONLY the probed shards' concrete dirs (path-level
    * pruning via the shard map), walk each probed shard's graph for just
    * the queries that probed it, and merge with the usual top-k window.
    * Query cost is ∝ nprobe shards regardless of nShards — the curve
    * hash routing cannot produce.
    */
  def searchIndexRouted(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Array[Double])],
      k: Int,
      efSearch: Int = 48,
      m: Int = 8,
      nprobe: Int = 2,
  ): DataFrame = {
    import spark.implicits._
    val fs = fsOf(spark, path)
    val map = readMap(fs, path, resolveSeq(fs, path))
    val owner = map.centroids.getOrElse(
      throw new IllegalStateException(s"no routed index at $path (missing centroids — built with buildIndexRouted?)"),
    )
    val cents = spark.read.parquet(centroidsDir(path, owner))
      .select(col("cid"), col("cv"))
      .as[(Long, Array[Double])]
      .collect()
    require(cents.nonEmpty, s"empty centroid table at $path — store is corrupt")
    val probeOf: Map[Long, Seq[Int]] = queries.map { case (qid, qv) =>
      qid -> cents.map { case (cid, cv) => (cid, VecMath.cosine(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nprobe)
        .map(_._1.toInt)
        .toSeq
    }.toMap
    val probedParts = probeOf.values.flatten.toSet
    val qB = spark.sparkContext.broadcast(queries.toArray)
    val routeB = spark.sparkContext.broadcast(probeOf)
    val local = readShards(spark, path, Some(probedParts))
      .as[IndexRow]
      .groupByKey(_.part)
      .flatMapGroups { (p, it) =>
        val rows = it.toArray.sortBy(_.ord)
        val vs = rows.map(_.v)
        val adj = rows.map(r => mutable.ArrayBuffer.from(r.nbrs))
        val entries = 0 until rows.length by math.max(1, rows.length / math.max(1, m))
        qB.value.iterator
          .filter { case (qid, _) => routeB.value(qid).contains(p) }
          .flatMap { case (qid, qv) =>
            drain(searchGraph(vs, adj, entries, qv, efSearch))
              .iterator
              .filter { case (_, i) => rows(i).vec_id != qid }
              .take(k)
              .map { case (s, i) => (qid, rows(i).vec_id, rows(i).label, s) }
          }
      }
      .toDF("qid", "vec_id", "label", "sim")
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    local
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("label"), col("sim"))
  }

  /** Incremental insert into a ROUTED index: new vectors are assigned to
    * their nearest stored centroid (frozen, one broadcast argmax — the
    * [[IvfStore.append]] discipline) and greedy-linked into that shard's
    * graph by the shared insert kernel; only touched shards rewrite
    * (into a fresh version, sealed atomically). Deterministic: frozen
    * centroids + the kernel's ordinal-then-id insertion order.
    */
  def insertIndexRouted(spark: SparkSession, path: String, newDocs: DataFrame, m: Int = 8, efBuild: Int = 24): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val fs = fsOf(spark, path)
    val map = readMap(fs, path, resolveSeq(fs, path))
    val owner = map.centroids.getOrElse(
      throw new IllegalStateException(s"$path is not a routed index (no centroids) — use insertIndex"),
    )
    val cb = spark.read.parquet(centroidsDir(path, owner))
    val routed = IvfStore.assign(newDocs, cb)
      .select(col("vec_id"), col("label"), col("v"), col("cid").cast("int").as("part"))
    insertRoutedRows(spark, path, routed, m, efBuild)
  }

  /** NSW kNN join: per-partition graphs, broadcast query batch, global
    * WindowGroupLimit top-k merge. Entry points: node 0 plus every
    * (n/m)-th node — cheap stand-ins for HNSW's upper layers.
    */
  def nsw(
      e: DataFrame,
      qids: Seq[Long],
      k: Int,
      m: Int = 8,
      efSearch: Int = 48,
      efBuild: Int = 24,
  ): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val queries: Array[(Long, Array[Double])] = e
      .where(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("v"))
      .as[(Long, Array[Double])]
      .collect()
    val qB = spark.sparkContext.broadcast(queries)
    val local = e
      .select(col("vec_id"), col("label"), col("v"))
      .as[(Long, String, Array[Double])]
      .mapPartitions { it =>
        val rows = it.toArray
        if (rows.isEmpty) Iterator.empty
        else {
          val vs = rows.map(_._3)
          val adj = buildGraph(vs, m, efBuild)
          val entries = 0 until rows.length by math.max(1, rows.length / math.max(1, m))
          qB.value.iterator.flatMap { case (qid, qv) =>
            drain(searchGraph(vs, adj, entries, qv, efSearch))
              .iterator
              .filter { case (_, i) => rows(i)._1 != qid }
              .take(k)
              .map { case (s, i) => (qid, rows(i)._1, rows(i)._2, s) }
          }
        }
      }
      .toDF("qid", "vec_id", "label", "sim")
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    local
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("label"), col("sim"))
  }
}
