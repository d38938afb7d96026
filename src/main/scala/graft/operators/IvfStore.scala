package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted IVF index (ROADMAP 32): the inverted-file ANN family's
  * counterpart to [[NswSearch.buildIndex]] and [[BandsStore]].
  *
  * [[AnnSearch.ivf]] (and the oracled `ann_ivf_trained` /
  * `vector_ivfpq_topk` queries) re-train the coarse quantizer and
  * re-assign the whole corpus on every query batch — fine for a demo,
  * wrong at 100 TB where training and assignment are the expensive
  * passes and query batches arrive continuously. This store runs those
  * passes ONCE:
  *
  *   - `path/v<seq>/codebook`: the trained centroids `(cid, cv)` — K
  *     rows, always driver/broadcast-sized.
  *   - `path/_current-<seq>`: empty pointer file, CREATED LAST
  *     (create-if-absent, the manifest `_head` discipline from
  *     [[graft.compact.ManifestCommit]]) — the commit point. Readers
  *     resolve the highest-seq pointer, so a crash mid-build/retrain
  *     leaves a partial `v<seq>` dir no reader ever sees (the previous
  *     version stays live); without this, a crash between the codebook
  *     and list writes would leave lists assigned under one codebook
  *     while search ranks probes against another — silently degraded
  *     neighbors with no detection.
  *   - `path/v<seq>/lists`: the corpus hive-partitioned by `cid` — each
  *     inverted list is a partition directory, so a probe of `nprobe`
  *     lists is a STATIC partition filter (the [[BandsStore.screen]]
  *     pruning discipline applied to vectors): a batch scans only the
  *     lists it probes, never the corpus.
  *
  * A query batch is then: collect the K-row codebook, rank each query's
  * centroids driver-side (same cosine fold as the
  * `cosine_similarity` expression — bit-exact, ties on cid asc, the
  * [[AnnSearch.ivf]] probe order), scan the probed partitions, join the
  * broadcast `(qid, pcid)` probe map, score candidates, and merge with
  * the map-side WindowGroupLimit top-k every kNN join here uses. The
  * shuffle carries ≤ B·k·tasks rows.
  *
  * Maintenance mirrors the reference points of the NSW family:
  * [[append]] assigns new vectors against the FROZEN codebook (one
  * broadcast argmax pass over the batch — history is never re-read) and
  * appends files to existing list partitions; hash routing against a
  * frozen codebook skews as the data distribution drifts, so
  * [[needsRetrain]] watches the max/mean list-size ratio and
  * [[retrain]] rebuilds codebook + lists from the stored rows with the
  * same deterministic recipe as [[build]] (seeds = lowest `nCentroids`
  * vec_ids, `lloydIters` assign/recenter rounds) — after a retrain the
  * store is indistinguishable from a fresh [[build]] on the union
  * corpus (IvfStoreSpec pins this, along with search parity against
  * [[AnnSearch.ivf]] and the probe-side partition pruning).
  */
object IvfStore {

  private def codebookPath(vdir: String) = s"$vdir/codebook"
  private def listsPath(vdir: String) = s"$vdir/lists"

  private val Ptr = graft.compact.VersionedPointer.Current

  private def fsOf(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest sealed version seq, if any build ever committed here. */
  private def currentSeq(fs: org.apache.hadoop.fs.FileSystem, path: String): Option[Long] =
    Ptr.resolve(fs, path)

  /** The live version dir; loud failure when no build has sealed (a
    * crashed first build leaves only an unsealed partial dir — re-run
    * build before trusting the store).
    */
  private def resolve(spark: SparkSession, path: String): String = {
    val seq = currentSeq(fsOf(spark, path), path).getOrElse(
      throw new IllegalStateException(s"no sealed IVF store at $path (crashed or missing build — re-run build)"),
    )
    s"$path/v$seq"
  }

  /** One broadcast argmax pass: every row of `e` gets the `cid` of its
    * nearest centroid (desc cosine, cid asc — the [[AnnSearch.ivf]]
    * assignment order).
    */
  private[operators] def assign(e: DataFrame, cb: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("acos"), col("cid"))
    e.crossJoin(broadcast(cb))
      .withColumn("acos", expr("cosine_similarity(v, cv)"))
      .withColumn("arn", row_number().over(w))
      .where(col("arn") === 1)
      .select(col("cid"), col("vec_id"), col("label"), col("v"))
  }

  /** Deterministic Lloyd training, identical to [[AnnSearch.ivf]]:
    * seeds are the `nCentroids` lowest vec_ids, each iteration
    * reassigns and recenters element-wise.
    */
  private[operators] def train(e: DataFrame, nCentroids: Int, lloydIters: Int, seedIds: Option[Seq[Long]]): DataFrame = {
    val seedSide = seedIds match {
      case Some(ids) => e.where(col("vec_id").isin(ids: _*))
      case None => e.orderBy(col("vec_id")).limit(nCentroids)
    }
    val seeds = seedSide.select(col("vec_id").as("cid"), col("v").as("cv"))
    def recenter(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(avg("x").as("cav"))
        .groupBy("cid")
        .agg(expr("transform(sort_array(collect_list(struct(pos, cav))), p -> p.cav)").as("cv"))
    (1 to lloydIters).foldLeft(seeds)((c, _) => recenter(assign(e, c).drop("label")))
  }

  /** Train the codebook on `e` (`(vec_id, label, v)` with
    * `cosine_similarity` registered), assign every vector, and write
    * codebook + cid-partitioned lists at `path` (overwrite). The two
    * expensive passes (train, assign) run exactly once per store
    * lifetime — queries and appends never repeat them.
    */
  def build(
      e: DataFrame,
      path: String,
      nCentroids: Int = 16,
      lloydIters: Int = 2,
      seedIds: Option[Seq[Long]] = None, // None → the nCentroids lowest vec_ids
  ): Unit = {
    val spark = e.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val fs = fsOf(spark, path)
    val prev = currentSeq(fs, path)
    val seq = prev.getOrElse(0L) + 1L
    val vdir = s"$path/v$seq"
    val cb = train(e, nCentroids, lloydIters, seedIds)
    // overwrite: a crashed unsealed attempt at this seq is safely redone
    cb.write.mode("overwrite").parquet(codebookPath(vdir))
    val stored = spark.read.parquet(codebookPath(vdir))
    assign(e, stored)
      .write.mode("overwrite").partitionBy("cid").parquet(listsPath(vdir))
    // commit point: create-if-absent pointer — a concurrent builder that
    // raced to the same seq fails loudly here instead of interleaving
    Ptr.seal(fs, path, seq)
    prev.foreach(_ => reclaimBelow(fs, path, seq))
  }

  /** Reclaim superseded versions (single-writer maintenance contract);
    * runs only after the new pointer sealed, so the max pointer always
    * resolves to a complete version whatever this loop got through.
    */
  private def reclaimBelow(fs: org.apache.hadoop.fs.FileSystem, path: String, seq: Long): Unit =
    fs.listStatus(new org.apache.hadoop.fs.Path(path)).foreach { st =>
      val n = st.getPath.getName
      val old =
        (st.isDirectory && n.startsWith("v") && n.drop(1).forall(_.isDigit) && n.drop(1).toLong < seq) ||
          (st.isFile && Ptr.seqOf(n).exists(_ < seq))
      if (old) { try fs.delete(st.getPath, true) catch { case _: Throwable => () }; () }
    }

  /** Assign a new batch against the FROZEN codebook and append to the
    * list partitions — per-batch work is one broadcast argmax over the
    * batch; no history row is read or rewritten.
    */
  def append(spark: SparkSession, newDocs: DataFrame, path: String): Unit = {
    graft.functions.GraftFunctions.register(spark)
    val vdir = resolve(spark, path)
    val cb = spark.read.parquet(codebookPath(vdir))
    assign(newDocs, cb)
      .write.mode("append").partitionBy("cid").parquet(listsPath(vdir))
  }

  /** Batch kNN search against the stored lists. Probe selection is
    * driver-side over the collected K-row codebook (bit-exact with the
    * in-plan ranking); the union of probed cids becomes a static
    * partition filter, so the scan reads only probed list directories.
    * Vectors whose `vec_id` equals the query's qid are excluded (the
    * corpus-member query convention of every ANN path here).
    */
  def search(
      spark: SparkSession,
      path: String,
      queries: Seq[(Long, Array[Double])],
      k: Int,
      nprobe: Int = 2,
  ): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vdir = resolve(spark, path)
    val cb: Array[(Long, Array[Double])] = spark.read.parquet(codebookPath(vdir))
      .select(col("cid"), col("cv"))
      .as[(Long, Array[Double])]
      .collect()
    val probes: Seq[(Long, Long)] = queries.flatMap { case (qid, qv) =>
      cb.map { case (cid, cv) => (cid, VecMath.cosine(qv, cv)) }
        .sortBy { case (cid, s) => (-s, cid) }
        .take(nprobe)
        .map { case (cid, _) => (qid, cid) }
    }
    val probedCids = probes.map(_._2).distinct.sorted
    val lists = spark.read.parquet(listsPath(vdir))
      .where(col("cid").isin(probedCids: _*)) // static partition filter
    val probeDf = broadcast(probes.toDF("qid", "pcid"))
    val qDf = broadcast(queries.toDF("qid2", "qv"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    lists
      .join(probeDf, col("cid") === col("pcid"))
      .join(qDf, col("qid") === col("qid2"))
      .where(col("vec_id") =!= col("qid"))
      .withColumn("sim", expr("cosine_similarity(v, qv)"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("label"), col("sim"))
  }

  /** Resolved-version codebook `(cid, cv)` — for sibling operators
    * (e.g. [[SemDedup]]) that route work through the frozen quantizer.
    */
  private[operators] def codebookDf(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(codebookPath(resolve(spark, path)))

  /** Resolved-version member lists; filter on `cid` before any action —
    * it is the partition column, so the filter is a static prune.
    */
  private[operators] def listsDf(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(listsPath(resolve(spark, path)))

  /** Per-list sizes `(cid, n)` — one metadata-cheap aggregate. */
  def listSizes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(listsPath(resolve(spark, path))).groupBy("cid").count().orderBy("cid")

  /** Retrain trigger: true when the largest list exceeds `skewFactor` ×
    * the mean list size — the frozen codebook no longer matches the
    * data distribution, and the hottest probe is paying for it.
    */
  def needsRetrain(spark: SparkSession, path: String, skewFactor: Double = 4.0): Boolean = {
    val row = listSizes(spark, path).agg(max("count").as("mx"), avg("count").as("mean")).head()
    !row.isNullAt(0) && row.getLong(0).toDouble > skewFactor * row.getDouble(1)
  }

  /** Rebuild codebook + lists from the stored rows with [[build]]'s
    * deterministic recipe. The store afterwards equals a fresh build on
    * the union corpus — stale assignment from drifted appends is gone.
    */
  /** Fold every inverted list's accumulated append-files into one file
    * per partition (ROADMAP 61): [[append]] writes one small parquet
    * file per touched cid per batch, so a long-lived store degrades
    * into exactly the small-files problem the table compactor exists
    * for. The fold rewrites rows UNCHANGED under the SAME codebook into
    * a fresh version dir (repartition on `cid` puts each list in one
    * task → one file per `cid=` directory) and flips the pointer last —
    * the build/retrain crash discipline, so a crash leaves the previous
    * version live; searches are row-identical by construction.
    */
  def compactLists(spark: SparkSession, path: String): Unit = {
    val fs = fsOf(spark, path)
    val prev = currentSeq(fs, path).getOrElse(
      throw new IllegalStateException(s"no sealed store at $path — nothing to compact"),
    )
    val vOld = s"$path/v$prev"
    val seq = prev + 1L
    val vNew = s"$path/v$seq"
    spark.read.parquet(codebookPath(vOld)).write.mode("overwrite").parquet(codebookPath(vNew))
    spark.read.parquet(listsPath(vOld))
      .repartition(col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(listsPath(vNew))
    Ptr.seal(fs, path, seq)
    reclaimBelow(fs, path, seq)
  }

  def retrain(spark: SparkSession, path: String, nCentroids: Int = 16, lloydIters: Int = 2): Unit = {
    // build() writes into a FRESH version dir and only reclaims this one
    // after its pointer seals, so the lazy read below scans stable files
    // throughout — no staging copy needed, and a crash at any point
    // leaves this version live and complete
    val corpus = spark.read.parquet(listsPath(resolve(spark, path)))
      .select(col("vec_id"), col("label"), col("v"))
    build(corpus, path, nCentroids, lloydIters)
  }
}
