package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
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
  * every kNN join here). A persisted-index production variant would
  * write the adjacency lists as a parquet sidecar keyed by partition —
  * the build step here IS that builder, minus the write.
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

  /** Persisted form of the per-partition graph: one row per node with
    * its partition, insertion ordinal, payload, and neighbor ORDINALS
    * (partition-local, so the row is self-contained and compact). The
    * index table replaces the O(n·efBuild·M) build on every query
    * batch with a scan — BandsStore's persisted-candidates pattern
    * applied to the graph family.
    */
  final case class IndexRow(
      part: Int,
      ord: Int,
      vec_id: Long,
      label: String,
      v: Array[Double],
      nbrs: Array[Int],
  )

  /** Build the per-partition graphs ONCE and write them as a parquet
    * index at `path` (overwrite). Graphs are identical to what [[nsw]]
    * builds on the same partitioning of `e`.
    */
  def buildIndex(e: DataFrame, path: String, m: Int = 8, efBuild: Int = 24): Unit = {
    val spark = e.sparkSession
    import spark.implicits._
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
      .write.mode("overwrite").partitionBy("part").parquet(path)
  }

  /** Incremental insert into a persisted index: each new vector is
    * routed to a shard by hash, greedy-linked into that shard's stored
    * graph exactly as a fresh build would link it (same search, same m
    * nearest, same bidirectional edges and degree cap), and ONLY the
    * touched shards are rewritten — untouched shard partitions keep
    * their files, the `BandsStore.append` discipline applied to graphs.
    * Insertion order within a shard is the stored ordinal order
    * followed by new-vector id order, so repeated inserts are
    * deterministic.
    *
    * `rebalanceMax` > 0 additionally runs [[rebalanceIndex]] after the
    * insert, so a long-lived index keeps its per-shard search cost
    * bounded without a separate maintenance pass; 0 (default) leaves
    * maintenance to the caller.
    */
  def insertIndex(spark: org.apache.spark.sql.SparkSession, path: String, newDocs: DataFrame, m: Int = 8, efBuild: Int = 24, rebalanceMax: Int = 0): Unit = {
    import spark.implicits._
    val parts = spark.read.parquet(path).select(col("part")).distinct().as[Int].collect().sorted
    require(parts.nonEmpty, s"no index shards at $path")
    val nParts = parts.length
    val routed = newDocs
      .select(col("vec_id"), col("label"), col("v"))
      .withColumn("part", pmod(col("vec_id"), lit(nParts.toLong)).cast("int"))
    insertRoutedRows(spark, path, routed, m, efBuild)
    if (rebalanceMax > 0) { rebalanceIndex(spark, path, rebalanceMax, m, efBuild); () }
  }

  /** Shared insert kernel: `routed` carries `(vec_id, label, v, part)`
    * with the shard already chosen (hash for [[insertIndex]], coarse
    * quantizer for [[insertIndexRouted]]); each new vector greedy-links
    * into its shard's stored graph and ONLY touched shard partitions
    * are rewritten.
    */
  private def insertRoutedRows(spark: org.apache.spark.sql.SparkSession, path: String, routed: DataFrame, m: Int, efBuild: Int): Unit = {
    import spark.implicits._
    val touched = routed.select("part").distinct().as[Int].collect().toSet
    val existing = spark.read.parquet(path)
      .select(col("part").cast("int").as("part"), col("ord"), col("vec_id"), col("label"), col("v"), col("nbrs"))
      .as[IndexRow]
      .filter(r => touched.contains(r.part))
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
    // rewrite ONLY the touched shard partitions (dynamic overwrite)
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten.toDF().write.mode("overwrite").partitionBy("part").parquet(path)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
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
    * the touched shard partitions (untouched shards keep their files,
    * the insertIndex discipline). A pure function of the stored index:
    * repeated rebalances are deterministic, and a rebalance with every
    * shard within bound is a no-op. Returns the number of shards split.
    *
    * Recall is preserved, not traded: every shard still answers every
    * query and the per-shard top-k merge is unchanged — more shards
    * mean more entry points, smaller graphs, and the same ≤ B·k·tasks
    * merge rows. Scale shape: only oversized shards' rows move (one
    * grouping shuffle), each chunk rebuild is task-local.
    */
  def rebalanceIndex(spark: org.apache.spark.sql.SparkSession, path: String, maxNodes: Int, m: Int = 8, efBuild: Int = 24): Int = {
    require(maxNodes > 0, s"maxNodes must be positive: $maxNodes")
    import spark.implicits._
    val sizes = spark.read.parquet(path)
      .groupBy(col("part").cast("int").as("part")).count()
      .as[(Int, Long)].collect().sortBy(_._1)
    require(sizes.nonEmpty, s"no index shards at $path")
    val oversized = sizes.filter(_._2 > maxNodes)
    if (oversized.isEmpty) return 0
    // fresh ids for every chunk after the first, assigned in shard order
    var nextId = sizes.map(_._1).max + 1
    val chunkIds: Map[Int, Seq[Int]] = oversized.map { case (part, n) =>
      val chunks = ((n + maxNodes - 1) / maxNodes).toInt
      val ids = part +: (0 until chunks - 1).map(i => nextId + i)
      nextId += chunks - 1
      part -> ids
    }.toMap
    val touched = chunkIds.keySet
    val rewritten = spark.read.parquet(path)
      .select(col("part").cast("int").as("part"), col("ord"), col("vec_id"), col("label"), col("v"), col("nbrs"))
      .as[IndexRow]
      .filter(r => touched.contains(r.part))
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
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try rewritten.toDF().write.mode("overwrite").partitionBy("part").parquet(path)
    finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    oversized.length
  }

  /** Search a persisted index: one shuffle groups each partition's rows
    * back together (cheap relative to the build it replaces — pure data
    * movement, no cosine passes), the adjacency arrays are reassembled
    * in insertion order, and the query batch runs the same greedy walk
    * as [[nsw]]. Same results as building fresh on the same
    * partitioning (NswIndexSpec pins the equality).
    */
  def searchIndex(spark: org.apache.spark.sql.SparkSession, path: String, queries: Seq[(Long, Array[Double])], k: Int, efSearch: Int = 48, m: Int = 8): DataFrame = {
    import spark.implicits._
    val qB = spark.sparkContext.broadcast(queries.toArray)
    val local = spark.read.parquet(path)
      .select(col("part").cast("int").as("part"), col("ord"), col("vec_id"), col("label"), col("v"), col("nbrs"))
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

  private def centroidsPath(path: String) = s"$path/_centroids"

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
    * determinism); centroids persist under `path/_centroids`
    * (underscore-hidden from the shard reads).
    *
    * Trade-offs vs hash routing, both kept on purpose:
    * [[insertIndex]]'s pmod routing needs no centroid lookup and keeps
    * working after [[rebalanceIndex]] widens the shard domain; routed
    * shards answer small query batches at nprobe/nShards of the scan
    * cost but pay one coarse-quantizer training at build time and skew
    * with data drift (rebuild when [[IvfStore.needsRetrain]]-style
    * skew appears — rebalance would orphan the centroid map).
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
        .write.mode("overwrite").partitionBy("part").parquet(path)
      // centroids AFTER the index write (overwrite above would wipe them)
      cb.write.mode("overwrite").parquet(centroidsPath(path))
    } finally { cb.unpersist(); () }
  }

  /** Search a centroid-routed index: rank shards per query against the
    * collected K-row centroid table (driver-side, the [[IvfStore.search]]
    * discipline), scan ONLY the union of probed shard partitions (static
    * partition filter), walk each probed shard's graph for just the
    * queries that probed it, and merge with the usual top-k window.
    * Query cost is ∝ nprobe shards regardless of nShards — the curve
    * hash routing cannot produce.
    */
  def searchIndexRouted(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queries: Seq[(Long, Array[Double])],
      k: Int,
      efSearch: Int = 48,
      m: Int = 8,
      nprobe: Int = 2,
  ): DataFrame = {
    import spark.implicits._
    val cents = spark.read.parquet(centroidsPath(path))
      .select(col("cid"), col("cv"))
      .as[(Long, Array[Double])]
      .collect()
    require(cents.nonEmpty, s"no routed index at $path (missing _centroids — built with buildIndexRouted?)")
    val probeOf: Map[Long, Seq[Int]] = queries.map { case (qid, qv) =>
      qid -> cents.map { case (cid, cv) => (cid, VecMath.cosine(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nprobe)
        .map(_._1.toInt)
        .toSeq
    }.toMap
    val probedParts = probeOf.values.flatten.toSeq.distinct.sorted
    val qB = spark.sparkContext.broadcast(queries.toArray)
    val routeB = spark.sparkContext.broadcast(probeOf)
    val local = spark.read.parquet(path)
      .where(col("part").isin(probedParts: _*)) // static partition filter
      .select(col("part").cast("int").as("part"), col("ord"), col("vec_id"), col("label"), col("v"), col("nbrs"))
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
    * graph by the shared insert kernel; only touched shards rewrite.
    * Deterministic: frozen centroids + the kernel's ordinal-then-id
    * insertion order.
    */
  def insertIndexRouted(spark: org.apache.spark.sql.SparkSession, path: String, newDocs: DataFrame, m: Int = 8, efBuild: Int = 24): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val cb = spark.read.parquet(centroidsPath(path))
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
