package graft.compact

import java.io.File
import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Repeated manifest-mode compaction of the SAME leaf — the real
  * production sequence, where later runs' inputs are earlier runs'
  * hidden `.data-*` outputs resolved through [[ManifestCommit.liveFiles]].
  * The chain exercises:
  *   - relative input paths that live in `.data-*` subdirs,
  *   - output-superseding (a later manifest's inputs subtract an earlier
  *     manifest's outputs from the live set),
  *   - torn manifests and orphan data dirs injected mid-chain not
  *     perturbing the live set,
  *   - gcOrphans never touching referenced dirs.
  * Invariant after every step: the leaf's bag of rows (read through the
  * resolver) is exactly the original bag.
  */
class ManifestChainSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(
    targetFileBytes = 10L * 1024 * 1024,
    maxRowsPerFile = 1000L,
    commitMode = CommitMode.Manifest,
  )

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-manifest-chain").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def writeFile(leaf: File, name: String, tag: String, n: Int): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, name).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ()
  }

  private def bag(leaf: String): Seq[String] =
    ManifestCommit.readLeaf(spark, leaf).collect().map(_.toString).sorted.toSeq

  test("three chained compactions preserve the bag; later manifests supersede earlier outputs") {
    val leaf = new File(root, "acct/source=chain/year=2026/month=01")
    leaf.mkdirs()
    Seq("a", "b", "c", "d").foreach(n => writeFile(leaf, s"$n.parquet", s"chain-$n", 10))
    val leafPath = leaf.getAbsolutePath
    val before = bag(leafPath)
    before.size shouldBe 40

    def compactLive(expectRows: Long): LeafResult = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      live.size should be >= 2
      val bytes = live.map(p => new File(p).length()).sum
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "chain", live, bytes), cfg)
      withClue(r) { r.success shouldBe true; r.rowsWritten shouldBe expectRows }
      r
    }

    // step 1: compact the four originals
    compactLive(40L)
    bag(leafPath) shouldBe before
    // noise injected mid-chain: a torn manifest and an orphan data dir
    Files.write(
      new File(leaf, "_manifest-chain-cafebabe.json").toPath,
      """{"runId":"cafebabe","stem":"chain","inputs":["a.parquet"],"outp""".getBytes,
    )
    val orphan = new File(leaf, ".data-0000orphan")
    orphan.mkdirs()
    Files.write(new File(orphan, "junk.parquet").toPath, Array[Byte](1, 2, 3))
    bag(leafPath) shouldBe before

    // new arrivals land next to the compacted tail, then step 2's inputs
    // MIX a .data-* member with visible originals, resolved via liveFiles
    Seq("e", "f").foreach(n => writeFile(leaf, s"$n.parquet", s"chain-$n", 10))
    val after2Arrivals = bag(leafPath)
    after2Arrivals.size shouldBe 60
    compactLive(60L)
    bag(leafPath) shouldBe after2Arrivals

    // step 3: one more arrival, three-manifest chain
    writeFile(leaf, "g.parquet", "chain-g", 10)
    val after3Arrivals = bag(leafPath)
    after3Arrivals.size shouldBe 70
    compactLive(70L)
    bag(leafPath) shouldBe after3Arrivals

    // the live set is exactly the LAST manifest's outputs — everything
    // earlier was superseded (no duplicates ever entered the resolver)
    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.foreach(_ should include("/.data-"))
    ManifestCommit.readLeaf(spark, leafPath).count() shouldBe 70L
    // three sealed manifests accumulated, plus the ignored torn one
    leaf.listFiles().count(f => f.getName.startsWith("_manifest-") && f.getName.endsWith(".json")) shouldBe 4

    // gcOrphans removes ONLY the injected orphan, never a referenced dir
    ManifestCommit.gcOrphans(spark, leafPath) shouldBe 1
    bag(leafPath) shouldBe after3Arrivals
    // superseded-but-referenced data dirs survive (their manifests still
    // name them; pruning manifest CHAINS is a compaction-of-manifests
    // concern, out of scope here)
    leaf.listFiles().count(_.getName.startsWith(".data-")) shouldBe 3
  }

  test("time travel: every retained snapshot reads the exact bag; expire makes older reads fail loudly") {
    val leaf = new File(root, "acct/source=tt/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val rcfg = cfg.copy(retainSuperseded = true)
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"tt-$n", 10))
    val rawBag = bag(leafPath)
    rawBag.size shouldBe 20

    def compactLive(): Unit = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      val bytes = live.map(p => new File(p).length()).sum
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "tt", live, bytes), rcfg)
      withClue(r)(r.success shouldBe true)
    }

    compactLive() // commit seq 1
    writeFile(leaf, "c.parquet", "tt-c", 5)
    val fullBag = bag(leafPath)
    fullBag.size shouldBe 25
    compactLive() // commit seq 2

    // the commit history is totally ordered and carries its row counts
    val log = ManifestCommit.manifestLog(spark, leafPath)
    log.map(_.seq) shouldBe Seq(1L, 2L)
    log.map(_.rows) shouldBe Seq(20L, 25L)
    log.map(_.stem).distinct shouldBe Seq("tt")

    // snapshot isolation: every as-of read returns the exact bag of its
    // time (compaction is bag-preserving, so values agree; the FILE sets
    // are the rewrite history and must differ per snapshot)
    def bagAt(seq: Long) =
      ManifestCommit.readLeafAt(spark, leafPath, seq).collect().map(_.toString).sorted.toSeq
    bagAt(0) shouldBe fullBag // pre-compaction raw view (a, b retained + c)
    bagAt(1) shouldBe fullBag
    bagAt(2) shouldBe fullBag
    ManifestCommit.liveFilesAt(spark, leafPath, 0).map(new File(_).getName).sorted shouldBe
      Seq("a.parquet", "b.parquet", "c.parquet")
    ManifestCommit.liveFilesAt(spark, leafPath, 1).exists(_.contains("/.data-")) shouldBe true
    ManifestCommit.liveFilesAt(spark, leafPath, 1).exists(_.endsWith("c.parquet")) shouldBe true
    ManifestCommit.liveFilesAt(spark, leafPath, 2) shouldBe ManifestCommit.liveFiles(spark, leafPath)
    ManifestCommit.liveFilesAt(spark, leafPath, 2).foreach(_ should include("/.data-"))

    // retention kept every superseded input on disk
    leaf.listFiles().map(_.getName) should contain allOf ("a.parquet", "b.parquet", "c.parquet")

    // expire commit 1's history: exactly its superseded inputs go; the
    // current set and every snapshot >= the horizon stay exact
    ManifestCommit.expireSnapshots(spark, leafPath, 1L) shouldBe 2
    leaf.listFiles().map(_.getName) should (not contain "a.parquet" and not contain "b.parquet")
    bag(leafPath) shouldBe fullBag
    bagAt(1) shouldBe fullBag // needs only .data-1 outputs + retained c
    // a snapshot OLDER than the horizon resolves the deleted raws from
    // the manifest log and fails loudly — never a silently partial bag
    an[Exception] should be thrownBy bagAt(0)
    // expire is idempotent once the files are gone
    ManifestCommit.expireSnapshots(spark, leafPath, 1L) shouldBe 0
  }

  test("diffSnapshots reports exactly the live-set delta between commits, and deltas compose") {
    val leaf = new File(root, "acct/source=diff/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val rcfg = cfg.copy(retainSuperseded = true)
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"d-$n", 10))
    def compactLive(): Unit = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      val bytes = live.map(p => new File(p).length()).sum
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "diff", live, bytes), rcfg)
      withClue(r)(r.success shouldBe true)
    }
    compactLive() // seq 1
    writeFile(leaf, "c.parquet", "d-c", 5)
    compactLive() // seq 2

    ManifestCommit.diffSnapshots(spark, leafPath, 1, 1) shouldBe ((Seq.empty, Seq.empty))
    // 0 -> 1: raws a/b drop, commit-1 outputs appear; c is an arrival,
    // not a versioned change — absent from the delta by design
    val (rm1, add1) = ManifestCommit.diffSnapshots(spark, leafPath, 0, 1)
    rm1.map(new File(_).getName).sorted shouldBe Seq("a.parquet", "b.parquet")
    add1 should not be empty
    add1.foreach(_ should include("/.data-"))
    // 1 -> 2: c and commit-1's outputs drop, commit-2's outputs appear
    val (rm2, add2) = ManifestCommit.diffSnapshots(spark, leafPath, 1, 2)
    rm2.map(new File(_).getName) should contain("c.parquet")
    add2 should not be empty
    // an incremental consumer applying both deltas lands on snapshot 2
    val s0 = ManifestCommit.liveFilesAt(spark, leafPath, 0).toSet
    val s2 = ManifestCommit.liveFilesAt(spark, leafPath, 2).toSet
    (s0 -- rm1 ++ add1 -- rm2 ++ add2) shouldBe s2
  }

  test("head pointer: one current head per leaf, O(1) resolution, torn pointer falls back to manifest scan") {
    val leaf = new File(root, "acct/source=head/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val fs = FileIndexer.fsFor(spark, leafPath)
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"hd-$n", 10))
    val before = bag(leafPath)

    def compactLive(): Unit = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      val bytes = live.map(p => new File(p).length()).sum
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "hd", live, bytes), cfg)
      withClue(r)(r.success shouldBe true)
    }
    def headNames() = leaf.listFiles().map(_.getName).filter(_.startsWith("_head-")).sorted.toSeq

    compactLive()
    headNames() shouldBe Seq("_head-000000001.json")
    // the head alone resolves the leaf: it covers every sealed manifest,
    // so the fast path reads ZERO manifests however long the chain gets
    val h1 = ManifestCommit.readHead(fs, new org.apache.hadoop.fs.Path(s"$leafPath/_head-000000001.json")).get
    h1.seq shouldBe 1L
    h1.covered shouldBe leaf.listFiles().map(_.getName).filter(_.startsWith("_manifest-")).toSet
    bag(leafPath) shouldBe before

    writeFile(leaf, "c.parquet", "hd-c", 10)
    val withC = bag(leafPath)
    compactLive()
    // older head pruned — exactly one pointer object per leaf
    headNames() shouldBe Seq("_head-000000002.json")
    bag(leafPath) shouldBe withC
    ManifestCommit.currentSeq(spark, leafPath) shouldBe 2L

    // torn pointer (partial upload): readers step past it to the full
    // manifest scan and still resolve the exact live set
    val head2 = new File(leaf, "_head-000000002.json")
    Files.write(head2.toPath, """{"seq":2,"runId":"dead","covered":["x""".getBytes)
    bag(leafPath) shouldBe withC
    ManifestCommit.currentSeq(spark, leafPath) shouldBe 2L // from the manifest fold

    // the next commit repairs the pointer and the seq chain continues —
    // never reuses a stamped seq
    writeFile(leaf, "d.parquet", "hd-d", 10)
    val withD = bag(leafPath)
    compactLive()
    headNames() shouldBe Seq("_head-000000003.json") // torn debris pruned too
    bag(leafPath) shouldBe withD
    ManifestCommit.manifestLog(spark, leafPath).map(_.seq) shouldBe Seq(1L, 2L, 3L)
  }

  test("createHead: second stamp of the same seq fails loudly; a torn stamp there is cleared and retried") {
    val leaf = new File(root, "acct/source=stamp/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val fs = FileIndexer.fsFor(spark, leafPath)
    ManifestCommit.createHead(fs, leafPath, 5L, "aaaa", Seq.empty, Seq.empty, Seq.empty, Seq.empty)
    // the decisive step of the race: same seq, different writer
    val e = intercept[ConcurrentCommitException] {
      ManifestCommit.createHead(fs, leafPath, 5L, "bbbb", Seq.empty, Seq.empty, Seq.empty, Seq.empty)
    }
    e.getMessage should include("seq 5")
    e.getMessage should include("aaaa")
    // idempotent re-stamp by the SAME writer is not a collision
    noException should be thrownBy
      ManifestCommit.createHead(fs, leafPath, 5L, "aaaa", Seq.empty, Seq.empty, Seq.empty, Seq.empty)
    // a torn head (dead writer's partial upload) never counts as a stamp:
    // it is cleared and the create retried
    val torn = new File(leaf, ManifestCommit.headName(6L))
    Files.write(torn.toPath, """{"seq":6,"runId":"cccc","cov""".getBytes)
    noException should be thrownBy
      ManifestCommit.createHead(fs, leafPath, 6L, "dddd", Seq.empty, Seq.empty, Seq.empty, Seq.empty)
    ManifestCommit.readHead(fs, new org.apache.hadoop.fs.Path(torn.getAbsolutePath)).get.runId shouldBe "dddd"
  }

  test("expire reclaims emptied data dirs and prunes fully-dead manifests; the newest commit survives") {
    val leaf = new File(root, "acct/source=gc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val rcfg = cfg.copy(retainSuperseded = true)
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"gc-$n", 10))
    def compactLive(): Unit = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      val bytes = live.map(p => new File(p).length()).sum
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "gc", live, bytes), rcfg)
      withClue(r)(r.success shouldBe true)
    }
    compactLive() // seq 1: a,b -> .data-1
    compactLive() // seq 2: .data-1 -> .data-2
    compactLive() // seq 3: .data-2 -> .data-3
    val fullBag = bag(leafPath)
    leaf.listFiles().count(_.getName.startsWith(".data-")) shouldBe 3
    leaf.listFiles().count(f => f.getName.startsWith("_manifest-")) shouldBe 3

    // expire everything below the newest commit: seq 1+2's inputs go,
    // their emptied .data dirs go, and manifest 1 (inputs a,b expired,
    // outputs .data-1 expired) is pruned as fully dead. Manifest 3 and
    // its outputs — the live set — are untouchable.
    ManifestCommit.expireSnapshots(spark, leafPath, 2L) should be > 0
    bag(leafPath) shouldBe fullBag
    // .data-1 emptied (its one file was manifest 2's expired input) and
    // reclaimed; .data-2 still holds manifest 3's input (seq 3 > horizon);
    // .data-3 is the live set
    leaf.listFiles().count(_.getName.startsWith(".data-")) shouldBe 2
    // manifest 1 is fully dead (inputs a,b expired; its outputs expired as
    // manifest 2's inputs) -> pruned; manifests 2 and 3 still name files
    // on disk and survive, so the seq chain's maximum is intact
    ManifestCommit.manifestLog(spark, leafPath).map(_.seq) shouldBe Seq(2L, 3L)
    // repeated cycles stay bounded: another expire is a no-op
    ManifestCommit.expireSnapshots(spark, leafPath, 2L) shouldBe 0
    bag(leafPath) shouldBe fullBag
  }

  test("run-loop maintenance: autoGcOrphans + expireKeepSnapshots reclaim debris operationally") {
    val leaf = new File(root, "acct/source=auto/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val mcfg = cfg.copy(
      retainSuperseded = true,
      autoGcOrphans = true,
      expireKeepSnapshots = Some(1),
    )
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"auto-$n", 10))
    // crashed-run debris from "yesterday": an orphan hidden data dir
    val orphan = new File(leaf, ".data-00deadrun")
    orphan.mkdirs()
    Files.write(new File(orphan, "junk.parquet").toPath, Array[Byte](9, 9))

    def runOnce(expectRows: Long): Unit = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      val bytes = live.map(p => new File(p).length()).sum
      val rs = Compactor.runBatch(spark, Seq(LeafPlan(leafPath, "auto", live, bytes)), mcfg)
      withClue(rs) { rs.map(_.success) shouldBe Seq(true); rs.head.rowsWritten shouldBe expectRows }
    }
    runOnce(20L)
    // the orphan went with the run — no separate operational step needed
    leaf.listFiles().map(_.getName) should not contain ".data-00deadrun"
    val bag1 = bag(leafPath)

    writeFile(leaf, "c.parquet", "auto-c", 5)
    runOnce(25L)
    // keep-1: the run expired commit 1's history right after commit 2 —
    // the superseded raws are gone; commit 1's data dir survives because
    // its file is commit 2's input (seq 2 is inside the keep window).
    // Current bag intact.
    bag(leafPath).size shouldBe 25
    leaf.listFiles().map(_.getName).count(_.startsWith(".data-")) shouldBe 2
    leaf.listFiles().map(_.getName) should not contain "a.parquet"
    ManifestCommit.currentSeq(spark, leafPath) shouldBe 2L
    bag1.size shouldBe 20

    // a third commit pushes commit 1's outputs past the horizon: its
    // emptied data dir is reclaimed by the same run
    writeFile(leaf, "d.parquet", "auto-d", 5)
    runOnce(30L)
    leaf.listFiles().map(_.getName).count(_.startsWith(".data-")) shouldBe 2 // commits 2 and 3
    bag(leafPath).size shouldBe 30
    ManifestCommit.currentSeq(spark, leafPath) shouldBe 3L
  }

  test("checkpoint folds the manifest prefix into one entry; every crash window reads exactly") {
    val leaf = new File(root, "acct/source=ckpt/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val rcfg = cfg.copy(retainSuperseded = true)
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"ck-$n", 10))
    def compactLive(): Unit = {
      val live = ManifestCommit.liveFiles(spark, leafPath)
      val bytes = live.map(p => new File(p).length()).sum
      val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "ck", live, bytes), rcfg)
      withClue(r)(r.success shouldBe true)
    }
    (1 to 5).foreach { i => writeFile(leaf, s"x$i.parquet", s"ck-x$i", 5); compactLive() }
    val fullBag = bag(leafPath)
    fullBag.size shouldBe 45
    def manifestNames() = leaf.listFiles().map(_.getName).filter(_.startsWith("_manifest-")).sorted.toSeq
    manifestNames().size shouldBe 5

    // fewer than two below the horizon -> no-op
    ManifestCommit.checkpoint(spark, leafPath, 1L) shouldBe 0

    // remember one FOLDED-prefix manifest (seq <= 3) so the delete-crash
    // window can be replayed after the real checkpoint
    val fs = FileIndexer.fsFor(spark, leafPath)
    val savedName = ManifestCommit.sealedManifestsNamed(fs, leafPath)
      .filter(_._2.seq <= 3L).minBy(_._2.seq)._1
    val savedBytes = Files.readAllBytes(new File(leaf, savedName).toPath)

    val realCkpt = ManifestCommit.checkpoint(spark, leafPath, 3L)
    realCkpt shouldBe 3
    manifestNames().count(_.contains("-checkpoint-")) shouldBe 1
    manifestNames().size shouldBe 3 // checkpoint + commits 4, 5
    bag(leafPath) shouldBe fullBag
    // the log now opens with the checkpoint at the folded prefix's seq
    val log = ManifestCommit.manifestLog(spark, leafPath)
    log.map(_.seq) shouldBe Seq(3L, 4L, 5L)
    log.head.stem shouldBe "checkpoint"

    // crash window: the folded-manifest deletes died partway — a prefix
    // manifest reappears next to the checkpoint. Its seq is at-or-below
    // the head's, so resolution skips it and readers stay exact.
    Files.write(new File(leaf, savedName).toPath, savedBytes)
    bag(leafPath) shouldBe fullBag
    new File(leaf, savedName).delete() shouldBe true
    bag(leafPath) shouldBe fullBag

    // the head was bumped past the last commit; the next commit continues
    // the chain without reusing a seq
    ManifestCommit.currentSeq(spark, leafPath) shouldBe 6L
    writeFile(leaf, "x6.parquet", "ck-x6", 5)
    compactLive()
    ManifestCommit.manifestLog(spark, leafPath).map(_.seq) shouldBe Seq(3L, 4L, 5L, 7L)
    val grownBag = bag(leafPath)
    grownBag.size shouldBe 50

    // pointer loss after a checkpoint: the full-scan fallback folds the
    // checkpoint like any prefix and still resolves the exact bag
    leaf.listFiles().filter(_.getName.startsWith("_head-")).foreach(_.delete())
    bag(leafPath) shouldBe grownBag
    ManifestCommit.currentSeq(spark, leafPath) shouldBe 7L
  }

  test("interleaved commits of two stems in one leaf get one strictly increasing seq line") {
    // One writer, two output groups (the GCP invoice/date shape): the
    // seq counter is per LEAF, not per stem, so the log stays a total
    // order and readLeafAt cuts both chains consistently.
    val leaf = new File(root, "acct/source=multi/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val rcfg = cfg.copy(retainSuperseded = true)
    def commitStem(stem: String, names: Seq[String], rows: Long): Unit = {
      val files = names.map(n => new File(leaf, n))
      val bytes = files.map(_.length()).sum
      val r = Merger.mergeAndCommit(
        spark, LeafPlan(leafPath, stem, files.map(_.getAbsolutePath), bytes), rcfg)
      withClue(r) { r.success shouldBe true; r.rowsWritten shouldBe rows }
    }
    Seq("p1", "p2", "q1", "q2").foreach(n => writeFile(leaf, s"$n.parquet", s"m-$n", 10))
    commitStem("px", Seq("p1.parquet", "p2.parquet"), 20L)
    commitStem("qx", Seq("q1.parquet", "q2.parquet"), 20L)
    Seq("p3", "p4").foreach(n => writeFile(leaf, s"$n.parquet", s"m-$n", 10))
    commitStem("px", Seq("p3.parquet", "p4.parquet"), 20L)

    val log = ManifestCommit.manifestLog(spark, leafPath)
    log.map(_.seq) shouldBe Seq(1L, 2L, 3L)
    log.map(_.stem) shouldBe Seq("px", "qx", "px")
    // cutting at seq 1: qx's originals read raw (commit 2 is after the
    // cut), px's first outputs through the manifest, and the later
    // arrivals p3/p4 appear raw (arrivals are not versioned) — 60 rows
    // total, same bag as current (compaction is bag-preserving)
    val at1 = ManifestCommit.liveFilesAt(spark, leafPath, 1L).map(new File(_).getName)
    at1.count(_.matches("q[0-9]+\\.parquet")) shouldBe 2
    at1.count(_.matches("p[0-9]+\\.parquet")) shouldBe 2 // p3, p4 raw; p1, p2 superseded
    ManifestCommit.readLeafAt(spark, leafPath, 1L).count() shouldBe 60L
    ManifestCommit.readLeaf(spark, leafPath).count() shouldBe 60L
    ManifestCommit.liveFiles(spark, leafPath).foreach(_ should include("/.data-"))
  }

  test("a manifest leaf is independently MOVABLE: a byte-identical directory clone resolves to the same bag/seq and commits on its own chain without perturbing the original — the relative-paths contract CompactBench's synth sweep fixture leans on") {
    import org.apache.spark.sql.functions.col
    val leaf = new File(root, "move/src-leaf")
    leaf.mkdirs()
    Seq("a", "b").foreach(n => writeFile(leaf, s"$n.parquet", s"mv-$n", 10))
    val lp = leaf.getAbsolutePath
    // a full little history: a compaction (hidden .data-* outputs), then
    // a MoR delete (a .delete-* sidecar) — every recorded path class
    val r = Merger.mergeAndCommit(
      spark, LeafPlan(lp, "m1", Seq(new File(leaf, "a.parquet"), new File(leaf, "b.parquet"))
        .map(_.getAbsolutePath), 20L), cfg)
    withClue(r) { r.success shouldBe true }
    ManifestCommit.deleteWhereMoR(spark, lp, col("id") === 1L, cfg).get.success shouldBe true
    val srcBag = bag(lp)
    val srcSeq = ManifestCommit.currentSeq(spark, lp)
    srcSeq shouldBe 2L

    // the clone is a plain recursive byte copy — the bench fixture's
    // exact mechanism
    val dst = new File(root, "move/dst-leaf")
    def copyTree(s: File, d: File): Unit =
      if (s.isDirectory) { d.mkdirs(); s.listFiles().foreach(c => copyTree(c, new File(d, c.getName))) }
      else { Files.copy(s.toPath, d.toPath); () }
    copyTree(leaf, dst)
    val dp = dst.getAbsolutePath
    ManifestCommit.currentSeq(spark, dp) shouldBe srcSeq
    bag(dp) shouldBe srcBag

    // independent lifecycles: a commit on the clone advances ONLY the
    // clone's chain; the original's bag and head are untouched
    ManifestCommit.deleteWhereMoR(spark, dp, col("id") === 2L, cfg).get.success shouldBe true
    ManifestCommit.currentSeq(spark, dp) shouldBe srcSeq + 1
    bag(dp).size shouldBe srcBag.size - 2 // id=2 killed in both tag groups
    ManifestCommit.currentSeq(spark, lp) shouldBe srcSeq
    bag(lp) shouldBe srcBag
  }
}
