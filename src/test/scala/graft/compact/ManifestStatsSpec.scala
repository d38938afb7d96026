package graft.compact

import java.io.File
import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** File-level data skipping over the manifest log: stats sidecars must
  * only ever CUT the scanned file set, never change a result — the
  * range read is row-identical to filtering the full resolved leaf,
  * files without recorded stats always survive pruning, and torn
  * sidecars degrade to no pruning. Lifecycle: orphan sidecars go with
  * gcOrphans, expired manifests take their sidecars along.
  */
class ManifestStatsSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(
    targetFileBytes = 10L * 1024 * 1024,
    maxRowsPerFile = 1000L,
    commitMode = CommitMode.Manifest,
    statsColumns = Seq("id", "v"),
    bloomColumns = Seq("tag"),
  )

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-manifest-stats").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  /** One visible parquet file of ids [lo, hi) with v = id * 2.5. */
  private def writeFile(leaf: File, name: String, lo: Long, hi: Long): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    (lo until hi).map(i => (i, i * 2.5, s"r$i")).toDF("id", "v", "tag")
      .coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, name).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ()
  }

  private def compactLive(leafPath: String, stem: String): LeafResult =
    compactFiles(leafPath, stem, ManifestCommit.liveFiles(spark, leafPath))

  /** Commit exactly `files` — the incremental shape where each commit
    * covers one arrival batch (so different commits' outputs keep
    * disjoint value ranges instead of re-merging prior outputs).
    */
  private def compactFiles(leafPath: String, stem: String, files: Seq[String]): LeafResult = {
    val bytes = files.map(p => new File(p).length()).sum
    val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, stem, files, bytes), cfg)
    withClue(r) { r.success shouldBe true }
    r
  }

  test("range reads prune to the commits whose range can match, results identical to the full read") {
    val leaf = new File(root, "acct/source=stats/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath

    // three commits over three disjoint id decades → three stats
    // sidecars with disjoint [min,max] per commit's outputs
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")
    writeFile(leaf, "a.parquet", 0L, 100L)
    writeFile(leaf, "b.parquet", 50L, 100L) // overlap inside decade 1
    compactFiles(leafPath, "d1", abs("a.parquet", "b.parquet"))
    writeFile(leaf, "c.parquet", 100L, 200L)
    writeFile(leaf, "d.parquet", 150L, 200L)
    compactFiles(leafPath, "d2", abs("c.parquet", "d.parquet"))
    writeFile(leaf, "e.parquet", 200L, 300L)
    writeFile(leaf, "f.parquet", 250L, 300L)
    compactFiles(leafPath, "d3", abs("e.parquet", "f.parquet"))

    val fs = FileIndexer.fsFor(spark, leafPath)
    val stats = ManifestStats.read(fs, leafPath)
    stats should not be empty
    // every live file has recorded stats for both columns
    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.foreach { f =>
      val rel = ManifestCommit.relativeTo(leafPath, f)
      withClue(rel)(stats(rel).cols.keySet shouldBe Set("id", "v"))
    }

    // a mid-decade range must prune decade 1 and 3 files entirely
    val kept = ManifestStats.pruneFiles(stats, leafPath, live, "id", 120d, 180d)
    kept.size should be < live.size
    kept should not be empty

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "tag").collect().map(_.toString).sorted.toSeq

    val pruned = ManifestStats.readLeafWhere(spark, leafPath, "id", 120d, 180d)
    val full = ManifestCommit.readLeaf(spark, leafPath)
      .where(org.apache.spark.sql.functions.col("id").between(120, 180))
    rows(pruned) shouldBe rows(full)
    // c.parquet holds 120..180 (61 rows); d.parquet duplicates 150..180 (31)
    pruned.count() shouldBe 92L

    // the double column prunes too (v = id * 2.5)
    rows(ManifestStats.readLeafWhere(spark, leafPath, "v", 300d, 400d)) shouldBe
      rows(ManifestCommit.readLeaf(spark, leafPath)
        .where(org.apache.spark.sql.functions.col("v").between(300d, 400d)))

    // an out-of-range read prunes EVERYTHING yet keeps the schema
    val none = ManifestStats.readLeafWhere(spark, leafPath, "id", 5000d, 6000d)
    none.count() shouldBe 0L
    none.columns should contain("tag")
  }

  test("compactWhere re-compacts one key range: only stats-intersecting files rewrite, bag identity holds") {
    val leaf = new File(root, "acct/source=rangec/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    // three commits over three disjoint id decades -> three live output
    // files with disjoint recorded intervals
    writeFile(leaf, "a.parquet", 0L, 100L)
    compactFiles(leafPath, "r1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 100L, 200L)
    compactFiles(leafPath, "r2", abs("b.parquet"))
    writeFile(leaf, "c.parquet", 200L, 300L)
    compactFiles(leafPath, "r3", abs("c.parquet"))

    val liveBefore = ManifestCommit.liveFiles(spark, leafPath)
    liveBefore.size shouldBe 3
    def rows() = ManifestCommit.readLeaf(spark, leafPath)
      .select("id", "v", "tag").collect().map(_.toString).sorted.toSeq
    val bagBefore = rows()

    // [120, 250] intersects decades 2 and 3 only: decade 1's file must
    // survive untouched (same path, same bytes)
    val fs = FileIndexer.fsFor(spark, leafPath)
    val untouched = ManifestStats
      .pruneFiles(ManifestStats.read(fs, leafPath), leafPath, liveBefore, "id", 0d, 99d)
    untouched.size shouldBe 1
    val untouchedLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(untouched.head)).getLen

    val res = ManifestCommit.compactWhere(spark, leafPath, "id", 120d, 250d, cfg, stem = "rw")
    res should not be empty
    withClue(res)(res.get.success shouldBe true)
    res.get.rowsWritten shouldBe 200L // decades 2+3

    // live set: the untouched decade-1 file persists by identity; the
    // two intersecting files were superseded by the rewrite's outputs
    val liveAfter = ManifestCommit.liveFiles(spark, leafPath)
    liveAfter should contain(untouched.head)
    fs.getFileStatus(new org.apache.hadoop.fs.Path(untouched.head)).getLen shouldBe untouchedLen
    liveAfter.toSet.intersect(liveBefore.toSet) shouldBe Set(untouched.head)

    // bag identity on the WHOLE leaf, and the range read still prunes
    rows() shouldBe bagBefore
    ManifestStats.readLeafWhere(spark, leafPath, "id", 120d, 250d).count() shouldBe 131L

    // the rewrite sealed fresh sidecars: its outputs have recorded stats
    liveAfter.filterNot(_ == untouched.head).foreach { p =>
      val rel = ManifestCommit.relativeTo(leafPath, p)
      withClue(rel)(ManifestStats.read(fs, leafPath)(rel).cols.keySet shouldBe Set("id", "v"))
    }

    // nothing intersects -> None, leaf untouched; a single-file range
    // respects the >=2 gate unless forced to re-layout
    ManifestCommit.compactWhere(spark, leafPath, "id", 5000d, 6000d, cfg) shouldBe None
    ManifestCommit.compactWhere(spark, leafPath, "id", 0d, 50d, cfg) shouldBe None
    val solo = ManifestCommit.compactWhere(spark, leafPath, "id", 0d, 50d, cfg, stem = "solo", minFiles = 1)
    solo.map(_.success) shouldBe Some(true)
    rows() shouldBe bagBefore
  }

  test("bloom sidecars prune point lookups; no false negatives; probes on bloom-less files keep them") {
    val leaf = new File(root, "acct/source=bloom/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 100L)
    compactFiles(leafPath, "b1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 100L, 200L)
    compactFiles(leafPath, "b2", abs("b.parquet"))
    writeFile(leaf, "c.parquet", 200L, 300L)
    compactFiles(leafPath, "b3", abs("c.parquet"))

    val fs = FileIndexer.fsFor(spark, leafPath)
    val blooms = ManifestStats.readBlooms(fs, leafPath)
    blooms should not be empty
    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.foreach { f =>
      withClue(f)(blooms(ManifestCommit.relativeTo(leafPath, f)).keySet shouldBe Set("tag"))
    }

    // point lookup on a tag only commit 2 holds: exact hit, and the
    // plan's input set shrinks to the files whose bloom could match
    // (at these bloom sizes the false-positive odds are negligible)
    val hit = ManifestStats.readLeafEquals(spark, leafPath, "tag", "r150")
    hit.count() shouldBe 1L
    hit.select("id").head().getLong(0) shouldBe 150L
    hit.inputFiles.length should be < live.size
    hit.inputFiles.length shouldBe 1
    // a tag nothing holds: empty result (files may survive as false
    // positives, rows cannot)
    ManifestStats.readLeafEquals(spark, leafPath, "tag", "r99999").count() shouldBe 0L

    // a raw arrival without a bloom is always scanned
    writeFile(leaf, "late.parquet", 5000L, 5010L)
    ManifestStats.readLeafEquals(spark, leafPath, "tag", "r5005").count() shouldBe 1L

    // equality with the unpruned filtered read over every probe value
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "tag").collect().map(_.toString).sorted.toSeq
    Seq("r0", "r150", "r299", "r5005", "nope").foreach { t =>
      withClue(t) {
        rows(ManifestStats.readLeafEquals(spark, leafPath, "tag", t)) shouldBe
          rows(ManifestCommit.readLeaf(spark, leafPath)
            .where(org.apache.spark.sql.functions.col("tag") === t))
      }
    }
  }

  test("readLeafPruned composes range and point prunes; BatchMerger commits seal the same sidecars") {
    val leaf = new File(root, "acct/source=comb/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 100L)
    compactFiles(leafPath, "c1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 100L, 200L)
    compactFiles(leafPath, "c2", abs("b.parquet"))
    // third commit goes through the BATCHED manifest path
    writeFile(leaf, "c.parquet", 200L, 300L)
    val f = s"$leafPath/c.parquet"
    val rs = BatchMerger.mergeAndCommitBatch(
      spark, Seq(LeafPlan(leafPath, "c3", Seq(f), new File(f).length())), cfg,
    )
    withClue(rs)(rs.forall(_.success) shouldBe true)

    val fs = FileIndexer.fsFor(spark, leafPath)
    // every commit — batched included — sealed both sidecar kinds
    val live = ManifestCommit.liveFiles(spark, leafPath)
    val stats = ManifestStats.read(fs, leafPath)
    val blooms = ManifestStats.readBlooms(fs, leafPath)
    live.foreach { p =>
      val rel = ManifestCommit.relativeTo(leafPath, p)
      withClue(rel) {
        stats.contains(rel) shouldBe true
        blooms.contains(rel) shouldBe true
      }
    }

    // combined range (commit 3's decade) + point (a tag in it)
    val got = ManifestStats.readLeafPruned(
      spark, leafPath,
      ranges = Map("id" -> ((210d, 290d))),
      points = Map("tag" -> "r250"),
    )
    got.count() shouldBe 1L
    got.inputFiles.length shouldBe 1
    // contradictory predicates (range in decade 1, point in decade 3):
    // intersection prunes everything, still schema-correct
    val none = ManifestStats.readLeafPruned(
      spark, leafPath,
      ranges = Map("id" -> ((0d, 50d))),
      points = Map("tag" -> "r250"),
    )
    none.count() shouldBe 0L
    // equality with the plain filtered read
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "tag").collect().map(_.toString).sorted.toSeq
    rows(got) shouldBe rows(
      ManifestCommit.readLeaf(spark, leafPath)
        .where(org.apache.spark.sql.functions.col("id").between(210, 290) &&
          org.apache.spark.sql.functions.col("tag") === "r250"),
    )
  }

  test("readLeafFiltered extracts prunable conjuncts from a Column and applies the full predicate exactly") {
    import org.apache.spark.sql.functions.{col => c}
    val leaf = new File(root, "acct/source=bridge/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")
    writeFile(leaf, "a.parquet", 0L, 100L)
    compactFiles(leafPath, "f1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 100L, 200L)
    compactFiles(leafPath, "f2", abs("b.parquet"))
    writeFile(leaf, "c.parquet", 200L, 300L)
    compactFiles(leafPath, "f3", abs("c.parquet"))

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "v", "tag").collect().map(_.toString).sorted.toSeq
    def same(pred: org.apache.spark.sql.Column) = {
      val bridged = ManifestStats.readLeafFiltered(spark, leafPath, pred)
      rows(bridged) shouldBe rows(ManifestCommit.readLeaf(spark, leafPath).where(pred))
      bridged
    }

    // range conjuncts prune to one commit's file
    same(c("id") >= 120L && c("id") < 180L).inputFiles.length shouldBe 1
    // string equality routes through the bloom
    same(c("tag") === "r250").inputFiles.length shouldBe 1
    // numeric equality routes through the stats interval — even with an
    // INT literal against the LONG column (the width-hazard case)
    same(c("id") === 150).inputFiles.length shouldBe 1
    // an OR is not prunable: full scan, exact result
    same(c("id") === 10L || c("tag") === "r250").inputFiles.length shouldBe 3
    // mixed: unknown conjunct + prunable conjunct still prunes on the latter
    same((c("v") * 2 > 100) && c("id") > 220L).inputFiles.length shouldBe 1
  }

  test("changedFilesWhere: incremental consumers see only changed-AND-range-matching files") {
    val leaf = new File(root, "acct/source=inc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 100L)
    writeFile(leaf, "b.parquet", 10L, 90L)
    compactFiles(leafPath, "i1", abs("a.parquet", "b.parquet"))
    val seq1 = ManifestCommit.currentSeq(spark, leafPath)
    writeFile(leaf, "c.parquet", 100L, 200L)
    writeFile(leaf, "d.parquet", 110L, 190L)
    compactFiles(leafPath, "i2", abs("c.parquet", "d.parquet"))
    writeFile(leaf, "e.parquet", 200L, 300L)
    writeFile(leaf, "f.parquet", 210L, 290L)
    compactFiles(leafPath, "i3", abs("e.parquet", "f.parquet"))
    val seq3 = ManifestCommit.currentSeq(spark, leafPath)

    // between seq1 and seq3 the adds are commit-2 and commit-3 outputs;
    // a decade-2 range keeps only commit 2's
    val changed = ManifestStats.changedFilesWhere(spark, leafPath, seq1, seq3, "id", 120d, 180d)
    changed should not be empty
    val (added2, added3) = {
      val (_, a12) = ManifestCommit.diffSnapshots(spark, leafPath, seq1, seq1 + 1)
      val (_, a23) = ManifestCommit.diffSnapshots(spark, leafPath, seq1 + 1, seq3)
      (a12.toSet, a23.toSet)
    }
    changed.toSet shouldBe (changed.toSet & added2)
    (changed.toSet & added3) shouldBe empty
    // and a range nothing new can match is an empty delta
    ManifestStats.changedFilesWhere(spark, leafPath, seq1, seq3, "id", 0d, 5d) shouldBe empty

    // metadata-only count: sidecar rows for committed files, footer
    // fallback for a raw arrival — always equal to the real count
    ManifestStats.countLeaf(spark, leafPath) shouldBe
      ManifestCommit.readLeaf(spark, leafPath).count()
    writeFile(leaf, "raw.parquet", 900L, 935L)
    ManifestStats.countLeaf(spark, leafPath) shouldBe
      ManifestCommit.readLeaf(spark, leafPath).count()

    // metadata min/max: None while the stats-less raw file is live
    // (a bound ignoring it would be wrong), defined once it commits
    ManifestStats.minMaxLeaf(spark, leafPath, "id") shouldBe None
    compactFiles(leafPath, "raw", abs("raw.parquet"))
    ManifestStats.minMaxLeaf(spark, leafPath, "id") shouldBe Some((0d, 934d))

    // exact range counts: fully-inside commits answer from metadata,
    // straddling ranges still come out exact
    def trueCount(lo: Long, hi: Long) = ManifestCommit.readLeaf(spark, leafPath)
      .where(org.apache.spark.sql.functions.col("id").between(lo, hi)).count()
    Seq((0L, 99L), (50L, 250L), (500L, 800L), (120L, 180L)).foreach { case (lo, hi) =>
      withClue(s"[$lo,$hi]") {
        ManifestStats.countLeafWhere(spark, leafPath, "id", lo.toDouble, hi.toDouble) shouldBe
          trueCount(lo, hi)
      }
    }
  }

  test("files without stats survive pruning; a torn sidecar means no pruning, same results") {
    val leaf = new File(root, "acct/source=nostats/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 0L, 100L)
    writeFile(leaf, "b.parquet", 100L, 200L)
    compactLive(leafPath, "s1")
    // a raw arrival AFTER the commit has no sidecar entry
    writeFile(leaf, "late.parquet", 900L, 950L)

    val fs = FileIndexer.fsFor(spark, leafPath)
    val live = ManifestCommit.liveFiles(spark, leafPath)
    val stats = ManifestStats.read(fs, leafPath)
    // the raw arrival is never pruned, even by a range it can't match
    ManifestStats.pruneFiles(stats, leafPath, live, "id", 0d, 10d)
      .map(ManifestCommit.relativeTo(leafPath, _)) should contain("late.parquet")
    ManifestStats.readLeafWhere(spark, leafPath, "id", 900d, 910d).count() shouldBe 11L

    // tear the sidecar: pruning degrades to a full scan, results intact
    val sidecar = leaf.listFiles().find(f => ManifestStats.runIdOf(f.getName).isDefined).get
    Files.write(sidecar.toPath, "{\"runId\":\"torn".getBytes)
    ManifestStats.read(fs, leafPath) shouldBe empty
    ManifestStats.readLeafWhere(spark, leafPath, "id", 0d, 10d).count() shouldBe 11L
  }

  test("checkpoint folds sidecars: one stats+bloom pair survives, pruned reads unchanged") {
    val leaf = new File(root, "acct/source=ckpt/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")
    writeFile(leaf, "a.parquet", 0L, 100L)
    compactFiles(leafPath, "k1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 100L, 200L)
    compactFiles(leafPath, "k2", abs("b.parquet"))
    writeFile(leaf, "c.parquet", 200L, 300L)
    compactFiles(leafPath, "k3", abs("c.parquet"))

    val before = ManifestStats.readLeafWhere(spark, leafPath, "id", 120d, 180d)
      .collect().map(_.toString).sorted.toSeq

    // fold ALL three commits into one checkpoint manifest
    val seq = ManifestCommit.currentSeq(spark, leafPath)
    ManifestCommit.checkpoint(spark, leafPath, seq) shouldBe 3

    // per-commit sidecars are gone; exactly one merged pair remains
    val statsSidecars = leaf.listFiles().filter(f => ManifestStats.runIdOf(f.getName).isDefined)
    val bloomSidecars = leaf.listFiles().filter(f => ManifestStats.bloomRunIdOf(f.getName).isDefined)
    statsSidecars.length shouldBe 1
    bloomSidecars.length shouldBe 1

    // pruning still works identically through the merged sidecars
    val after = ManifestStats.readLeafWhere(spark, leafPath, "id", 120d, 180d)
    after.collect().map(_.toString).sorted.toSeq shouldBe before
    after.inputFiles.length shouldBe 1
    ManifestStats.readLeafEquals(spark, leafPath, "tag", "r250").inputFiles.length shouldBe 1
  }

  test("Z-order layout composes with stats skipping: one commit's outputs prune within themselves") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "acct/source=zstats/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath

    // ONE arrival of 4000 SHUFFLED ids: without layout, every output
    // file spans the whole id range (arrival order) and a range read
    // can prune nothing; with layoutKeys the merge range-clusters, so
    // each output covers a narrow id band and the stats prune bites
    // INSIDE a single commit — the OPTIMIZE ZORDER + data-skipping
    // loop of a lakehouse.
    val shuffled = new scala.util.Random(7).shuffle((0L until 4000L).toVector)
    val tmp = new File(leaf, ".tmp-z")
    shuffled.map(i => (i, i * 2.5, s"r$i")).toDF("id", "v", "tag")
      .coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, "z.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()

    val zcfg = cfg.copy(layoutKeys = Seq("id"), maxRowsPerFile = 1000L)
    val f = s"$leafPath/z.parquet"
    val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "z", Seq(f), new File(f).length()), zcfg)
    withClue(r) { r.success shouldBe true }

    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.size should be >= 4 // the row cap split the commit into files

    val narrow = ManifestStats.readLeafWhere(spark, leafPath, "id", 1200d, 1400d)
    narrow.count() shouldBe 201L
    withClue(s"scanned ${narrow.inputFiles.length} of ${live.size}") {
      narrow.inputFiles.length should be < live.size
    }
  }

  test("review regressions: NULL-aware range counts, mistyped string probes, empty leaves") {
    import org.apache.spark.sql.functions.{col => c}
    val s = spark
    import s.implicits._
    val leaf = new File(root, "acct/source=nulls/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath

    // a file whose v column carries NULLs: countLeafWhere must not
    // credit the whole file's row count for a range the interval fits
    val tmp = new File(leaf, ".tmp-n")
    (0L until 100L).map(i => (i, if (i % 10 == 0) None else Some(i * 1.0), s"r$i"))
      .toDF("id", "v", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, "n.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    val f = s"$leafPath/n.parquet"
    val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "n", Seq(f), new File(f).length()), cfg)
    withClue(r)(r.success shouldBe true)

    ManifestStats.countLeafWhere(spark, leafPath, "v", 0d, 1000d) shouldBe
      ManifestCommit.readLeaf(spark, leafPath).where(c("v").between(0d, 1000d)).count()
    // the null-free id column still answers from metadata (no scan
    // needed: interval inside, zero nulls)
    ManifestStats.countLeafWhere(spark, leafPath, "id", 0d, 1000d) shouldBe 100L

    // a STRING literal against the LONG id column through the bridge:
    // blooms must not fire on the mistyped probe — Spark coerces and
    // the row must come back
    ManifestStats.readLeafFiltered(spark, leafPath, c("id") === "50").count() shouldBe 1L

    // empty / nonexistent leaves return empty frames, no analysis error
    val ghost = new File(root, "acct/source=ghost/year=2026/month=01").getAbsolutePath
    ManifestStats.readLeafWhere(spark, ghost, "id", 0d, 1d).count() shouldBe 0L
    ManifestStats.readLeafEquals(spark, ghost, "tag", "x").count() shouldBe 0L
    ManifestStats.readLeafPruned(spark, ghost, ranges = Map("id" -> ((0d, 1d)))).count() shouldBe 0L
    ManifestStats.readLeafFiltered(spark, ghost, c("id") === 1L).count() shouldBe 0L
    ManifestStats.countLeaf(spark, ghost) shouldBe 0L
  }

  test("lifecycle: gcOrphans removes orphan sidecars; expireSnapshots takes pruned manifests' sidecars") {
    val leaf = new File(root, "acct/source=lc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 0L, 50L)
    writeFile(leaf, "b.parquet", 50L, 100L)
    compactLive(leafPath, "lc")

    // an orphan sidecar from a run that died before its commit point
    Files.write(
      new File(leaf, "_stats-deadbeef00.json").toPath,
      ("""{"runId":"deadbeef00","files":[{"f":".data-deadbeef00/x.parquet","c":"id:[0.0;9.0]"}],""" +
        "\"sealed\":true}").getBytes,
    )
    ManifestCommit.gcOrphans(spark, leafPath)
    new File(leaf, "_stats-deadbeef00.json").exists() shouldBe false

    // chain a second commit, then expire history below it: the folded
    // manifest is pruned once its files are gone, and its sidecar with it
    writeFile(leaf, "c.parquet", 100L, 150L)
    compactLive(leafPath, "lc")
    val seq = ManifestCommit.currentSeq(spark, leafPath)
    ManifestCommit.expireSnapshots(spark, leafPath, seq - 1)
    val sidecars = leaf.listFiles().count(f => ManifestStats.runIdOf(f.getName).isDefined)
    val manifests = leaf.listFiles().count(_.getName.startsWith("_manifest-"))
    sidecars shouldBe manifests // one surviving commit, one surviving sidecar
    // the surviving range read still works
    ManifestStats.readLeafWhere(spark, leafPath, "id", 0d, 10d).count() shouldBe 11L
  }
}
