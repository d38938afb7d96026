package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Store maintenance must act exactly when its dials trip — compact a
  * fragmented store (reads unchanged), retrain a skewed one (preserving
  * the centroid count) — and be a no-op on a healthy store, so it is
  * safe to schedule on every ingest cycle.
  */
class StoreMaintenanceSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-storemaint").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def vecs = graft.queries.SimilarityQueries.vecs(spark, sf)

  private def queriesFor(e: org.apache.spark.sql.DataFrame, qids: Seq[Long]) =
    e.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("fragmented IVF store compacts on maintenance, search unchanged; healthy re-run is a no-op") {
    val e = vecs.cache()
    try {
      val path = new File(root, "ivf-frag").getAbsolutePath
      IvfStore.build(e.where(col("vec_id") % 4 === 0), path, nCentroids = 8, lloydIters = 1)
      (1 to 3).foreach(i => IvfStore.append(spark, e.where(col("vec_id") % 4 === i), path))

      val q = queriesFor(e, Seq(3L, 14L))
      val before = rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3))

      // skewFactor raised out of reach: this case isolates the compaction dial
      val r1 = StoreMaintenance.maintainIvf(spark, path, skewFactor = 1e9)
      r1.compacted shouldBe true
      r1.retrained shouldBe false
      rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3)) shouldBe before

      val r2 = StoreMaintenance.maintainIvf(spark, path, skewFactor = 1e9)
      r2.compacted shouldBe false
      r2.retrained shouldBe false
    } finally { e.unpersist(); () }
  }

  test("skewed IVF store retrains preserving its centroid count") {
    val e = vecs.cache()
    try {
      // the IvfStoreSpec drift recipe: codebook fit to a narrow slice,
      // then the rest of the corpus appended against it
      val path = new File(root, "ivf-drift").getAbsolutePath
      IvfStore.build(e.where(col("vec_id") <= 40), path, nCentroids = 8, lloydIters = 1)
      IvfStore.append(spark, e.where(col("vec_id") > 40), path)

      val wasSkewed = IvfStore.needsRetrain(spark, path, skewFactor = 2.0)
      val r = StoreMaintenance.maintainIvf(spark, path, skewFactor = 2.0, lloydIters = 1)
      r.retrained shouldBe wasSkewed
      if (wasSkewed) IvfStore.needsRetrain(spark, path, skewFactor = 2.0) shouldBe false
      IvfStore.codebookDf(spark, path).count() shouldBe 8L
    } finally { e.unpersist(); () }
  }

  test("fragmented bands store compacts on maintenance, screen unchanged; then a no-op") {
    val docs = graft.Tables.documents(spark, sf)
    val h1 = docs.where(col("doc_id") % 2 === 0)
    val h2 = docs.where(col("doc_id") % 2 === 1 && col("doc_id") % 4 === 1)
    val h3 = docs.where(col("doc_id") % 4 === 3)
    val store = new File(root, "bands-frag").getAbsolutePath
    BandsStore.build(spark, h1, store)
    BandsStore.append(spark, h2, store)
    BandsStore.append(spark, h3, store)

    val probe = docs.where(col("doc_id") < 50)
    val before = BandsStore.screen(spark, probe, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val r1 = StoreMaintenance.maintainBands(spark, store)
    r1.compacted shouldBe true
    BandsStore.screen(spark, probe, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe before

    StoreMaintenance.maintainBands(spark, store).compacted shouldBe false
  }

  test("skewed routed NSW store rebuilds on maintenance; healthy store is a no-op") {
    val e = vecs.cache()
    try {
      val path = new File(root, "nsw-drift").getAbsolutePath
      NswSearch.buildIndexRouted(e, path, nShards = 8, lloydIters = 1, seedIds = Some(1L to 8L))

      // healthy store: neither dial trips
      val r0 = StoreMaintenance.maintainNswRouted(spark, path, skewFactor = 2.0, lloydIters = 1)
      r0.retrained shouldBe false
      r0.compacted shouldBe false

      // drift: a tight NEW cluster (unrepresented when the quantizer was
      // trained) arrives; frozen routing piles it into one hot shard —
      // exactly the flatMapGroups-holds-a-whole-shard hazard the dial
      // watches (the real fixture's clusters are all represented at
      // build time, so organic inserts spread; an unseen mode doesn't)
      val hot = spark.createDataFrame((10000L until 10200L).map { i =>
        val v = Array.tabulate(64)(j => if (j % 2 == 0) 0.8 else -0.8)
        v((i % 64L).toInt) += 0.001 * (i % 7L)
        (i, 99, v)
      }).toDF("vec_id", "label", "v")
      NswSearch.insertIndexRouted(spark, path, hot)
      val sizes0 = NswSearch.readIndex(spark, path).groupBy("part").count()
        .collect().map(_.getLong(1))
      sizes0.max.toDouble should be > 2.0 * (sizes0.sum.toDouble / sizes0.length)

      val r = StoreMaintenance.maintainNswRouted(spark, path, skewFactor = 2.0, lloydIters = 1)
      r.retrained shouldBe true
      // rebuild preserved the corpus (same centroid count, new geometry)
      val union = e.unionByName(hot)
      NswSearch.readIndex(spark, path).count() shouldBe union.count()
      NswSearch.readIndex(spark, path).select("vec_id").distinct().count() shouldBe union.count()

      // the rebuilt store still answers real queries at the routed
      // recall floor (probing half the shards)
      val qids = 0L until 20L
      val exact = AnnSearch.exact(union, qids, 5)
      val routed = NswSearch.searchIndexRouted(spark, path, queriesFor(e, qids), k = 5, efSearch = 64, nprobe = 4)
      AnnSearch.recallAt(exact, routed, qids, 5) should be >= 0.8
    } finally { e.unpersist(); () }
  }

  test("version-sprawled routed NSW store compacts on maintenance, answers unchanged") {
    val e = vecs.cache()
    try {
      val path = new File(root, "nsw-sprawl").getAbsolutePath
      NswSearch.buildIndexRouted(e.where(col("vec_id") >= 100), path, nShards = 8, lloydIters = 1, seedIds = Some(100L to 107L))
      // five single-doc inserts: each seals a new version owning one
      // rewritten shard — live shards end up spread over many dirs
      (0L until 5L).foreach { i =>
        NswSearch.insertIndexRouted(spark, path, e.where(col("vec_id") === i))
      }
      NswSearch.versionSpread(spark, path) should be > 4

      val q = queriesFor(e, Seq(200L, 300L))
      def answers() = NswSearch.searchIndexRouted(spark, path, q, k = 5, efSearch = 64, nprobe = 8)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val before = answers()

      val r = StoreMaintenance.maintainNswRouted(spark, path, skewFactor = 1e9)
      r.compacted shouldBe true
      r.retrained shouldBe false
      NswSearch.versionSpread(spark, path) shouldBe 1
      answers() shouldBe before

      StoreMaintenance.maintainNswRouted(spark, path, skewFactor = 1e9).compacted shouldBe false
    } finally { e.unpersist(); () }
  }

  test("generation-sprawled inverted index compacts on maintenance, probes unchanged; then a no-op") {
    val docs = graft.Tables.documents(spark, sf)
    val path = new File(root, "idx-sprawl").getAbsolutePath
    IndexStore.build(spark, docs.where(col("doc_id") % 6 === 0), path)
    (1L until 6L).foreach { k =>
      IndexStore.append(spark, docs.where(col("doc_id") % 6 === k), path)
      ()
    }
    IndexStore.generationCount(spark, path) shouldBe 6
    val terms = Seq("spark", "merge", "window")
    def probe() = IndexStore.search(spark, path, terms).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toSeq
    val before = probe()

    val r = StoreMaintenance.maintainIndex(spark, path)
    r.compacted shouldBe true
    IndexStore.generationCount(spark, path) shouldBe 1
    probe() shouldBe before

    StoreMaintenance.maintainIndex(spark, path).compacted shouldBe false
  }

  test("generation-sprawled cluster-rep store compacts on maintenance, assignment unchanged; then a no-op") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("quality"))
    val path = new File(root, "crep-sprawl").getAbsolutePath
    (0L until 6L).foreach { k =>
      ClusterRepStore.update(spark, path, docs.where(col("doc_id") % 6 === k))
      ()
    }
    ClusterRepStore.generationCount(spark, path) shouldBe 6L
    def assign() = ClusterRepStore.assignment(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = assign()

    val r = StoreMaintenance.maintainClusterRep(spark, path)
    r.compacted shouldBe true
    ClusterRepStore.generationCount(spark, path) shouldBe 1L
    assign() shouldBe before

    StoreMaintenance.maintainClusterRep(spark, path).compacted shouldBe false
  }

  test("leaf-clustering dial: a fully interleaved leaf re-sorts through the commit path; the re-sorted leaf is a no-op") {
    import graft.compact._
    val s = spark
    import s.implicits._
    val leaf = new File(root, "recluster-leaf"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    // targetFileBytes tiny so the re-sort emits SEVERAL range-bucketed
    // outputs — a 1-file result would read as depth 1 trivially
    val cfg = CompactorConfig(
      commitMode = CommitMode.Manifest, retainSuperseded = true,
      statsColumns = Seq("id"), targetFileBytes = 8 * 1024,
    )
    // four committed files, each round-robin over the WHOLE id range —
    // the layout a long arrival history degrades into: every file's
    // [min, max] spans everything, a point query opens all four
    (0 until 4).foreach { j =>
      val tmp = new File(leaf, s".tmp-$j")
      (0L until 2000L).filter(_ % 4 == j).map(i => (i, s"row$i"))
        .toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new File(leaf, s"f$j.parquet").toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      // commit THROUGH mergeAndCommit so each file gets a stats sidecar
      val f = s"$leafPath/f$j.parquet"
      ManifestCommit.mergeAndCommit(
        spark, LeafPlan(leafPath, s"in$j", Seq(f), new File(f).length()), cfg,
      ).success shouldBe true
    }
    val depth0 = ManifestStats.clusteringDepth(spark, leafPath, "id").get
    depth0 should be > 3.5 // four fully-overlapping spans
    val before = ManifestCommit.readLeaf(spark, leafPath)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

    val r = StoreMaintenance.maintainClustering(spark, leafPath, "id", cfg, maxDepth = 2.0)
    r.compacted shouldBe true
    // bag identity through the re-sort, several outputs, near-disjoint
    // fresh sidecars — and the dial now reads healthy
    ManifestCommit.readLeaf(spark, leafPath)
      .select("id", "tag").collect().map(x => (x.getLong(0), x.getString(1))).sorted.toSeq shouldBe before
    ManifestCommit.liveFiles(spark, leafPath).size should be > 1
    val depth1 = ManifestStats.clusteringDepth(spark, leafPath, "id").get
    depth1 should be < 1.5
    StoreMaintenance.maintainClustering(spark, leafPath, "id", cfg, maxDepth = 2.0)
      .compacted shouldBe false

    // unassessable leaves are left alone: a raw arrival without a
    // sidecar interval parks the dial at None → no-op
    val tmp = new File(leaf, ".tmp-raw")
    Seq((99999L, "raw")).toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    Files.move(
      tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      new File(leaf, "raw.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ManifestStats.clusteringDepth(spark, leafPath, "id") shouldBe None
    StoreMaintenance.maintainClustering(spark, leafPath, "id", cfg, maxDepth = 2.0)
      .compacted shouldBe false
  }

  test("clusteringDepth on point intervals: distinct constants are perfectly clustered (1.0), a shared constant is true overlap — no eternal re-sort loop") {
    import graft.compact._
    val s = spark
    import s.implicits._
    def pointLeaf(name: String, vals: Seq[Long]): String = {
      val leaf = new File(root, name); leaf.mkdirs()
      val leafPath = leaf.getAbsolutePath
      val cfg = CompactorConfig(commitMode = CommitMode.Manifest, statsColumns = Seq("id"))
      vals.zipWithIndex.foreach { case (v, j) =>
        val tmp = new File(leaf, s".tmp-$j")
        Seq((v, s"r$j")).toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, new File(leaf, s"f$j.parquet").toPath)
        tmp.listFiles().foreach(_.delete()); tmp.delete()
        val fp = new File(leaf, s"f$j.parquet")
        ManifestCommit.mergeAndCommit(
          spark, LeafPlan(leafPath, s"p$j", Seq(fp.getAbsolutePath), fp.length()), cfg,
        ).success shouldBe true
      }
      leafPath
    }
    // three single-value files at DISTINCT values: a point query opens
    // exactly one — depth 1.0, and the dial must never re-sort it (the
    // first cut read this as fileCount and would have rewritten the
    // leaf on every pass forever)
    val distinct = pointLeaf("pts-distinct", Seq(10L, 20L, 30L))
    ManifestStats.clusteringDepth(spark, distinct, "id") shouldBe Some(1.0)
    // three files at ONE value: every point query opens all three
    val shared = pointLeaf("pts-shared", Seq(7L, 7L, 7L))
    ManifestStats.clusteringDepth(spark, shared, "id") shouldBe Some(3.0)
  }
}
