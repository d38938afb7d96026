package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `ManifestCommit.merge` — MERGE INTO (key-based upsert) as one
  * manifest commit: matched editions replaced, unmatched source rows
  * inserted, untouched files never rewritten, NULL keys never matching,
  * and the commit feeding downstream consumers as retract+assert.
  */
class MergeCommitSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-merge").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def writeFile(leaf: File, name: String, rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    rows.toDF("id", "v").coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, name).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ()
  }

  private def commitAll(leafPath: String): Unit = {
    val fs = FileIndexer.fsFor(spark, leafPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(leafPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).sorted.zipWithIndex.foreach { case (f, i) =>
        ManifestCommit.publish(
          fs, leafPath, s"arr$i", s"mrun$i",
          inputsRel = Seq(), outputsRel = Seq(new org.apache.hadoop.fs.Path(f).getName),
          rows = spark.read.parquet(f).count(),
        )
      }
  }

  private def bag(leaf: String): Seq[(Long, String)] =
    ManifestCommit.readLeaf(spark, leaf).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(t => (t._1, t._2)).toSeq

  private def df(rows: Seq[(Long, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "v")
  }

  test("string-keyed merge classifies through the bloom sidecars: non-hit files are NEVER OPENED (they are corrupted)") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "bloomkey"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val bcfg = cfg.copy(bloomColumns = Seq("doc"))
    def ingest(ids: Seq[Long]): Unit = {
      val df = ids.map(i => (s"d$i", s"old$i")).toDF("doc", "v").coalesce(1)
      WapCommit.writeAuditPublish(spark, leafPath, df, Seq(WapCommit.AuditCheck.notNull("doc")), bcfg)
      ()
    }
    ingest(1L to 100L)
    ingest(101L to 200L)
    ingest(201L to 300L)
    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.size shouldBe 3

    // the source hits ONLY the middle commit's key range; the other two
    // files are garbage on disk while the merge runs — a classification
    // that opened them would die, a bloom-pruned one never looks
    val hitFile = live.find { p =>
      try spark.read.parquet(p).where(col("doc") === "d150").count() > 0
      catch { case _: Throwable => false }
    }.get
    val others = live.filterNot(_ == hitFile)
    def clobber(p: String): Array[Byte] = {
      val orig = Files.readAllBytes(new File(p).toPath)
      val bad = orig.clone()
      (math.max(0, bad.length - 16) until bad.length).foreach(i => bad(i) = 0x5a)
      (0 until math.min(64, bad.length)).foreach(i => bad(i) = 0x5a)
      Files.write(new File(p).toPath, bad)
      orig
    }
    val saved = others.map(p => p -> clobber(p))
    val src = Seq(("d150", "new150"), ("d2000", "ins")).toDF("doc", "v")
    val r = ManifestCommit.merge(spark, leafPath, src, Seq("doc"), bcfg)
    saved.foreach { case (p, b) => Files.write(new File(p).toPath, b); () }
    withClue(r) { r.get.success shouldBe true }

    // only the hit file was superseded; reads reflect the upsert
    val liveAfter = ManifestCommit.liveFiles(spark, leafPath).toSet
    (live.toSet -- liveAfter) shouldBe Set(hitFile)
    val got = ManifestCommit.readLeaf(spark, leafPath)
      .where(col("doc").isin("d150", "d2000", "d50", "d250"))
      .select("doc", "v").collect().map(r2 => (r2.getString(0), r2.getString(1))).toSet
    got shouldBe Set(("d150", "new150"), ("d2000", "ins"), ("d50", "old50"), ("d250", "old250"))
  }

  test("a PURE-UPDATE merge (every source key matched) replays as retract+assert — count equality must not read as row preservation") {
    val leaf = new File(root, "pureupd"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 20L).map(i => (i, s"old$i")))
    commitAll(leafPath)
    val c0 = ChangeFeed.Cursor.atHead(spark, leafPath)

    // zero inserts: staged rows == input rows, values CHANGED
    val source = (5L to 9L).map(i => (i, s"new$i"))
    ManifestCommit.merge(spark, leafPath, df(source), Seq("id"), cfg).get.success shouldBe true

    val ch = ChangeFeed.changesSince(spark, leafPath, c0)
    ch.mode shouldBe "walk"
    withClue("a value-mutating commit must never net to zero in the walk") {
      ch.isEmpty shouldBe false
    }
    // the four-term fold lands on the post-merge bag: new editions in,
    // old editions out
    val plus = ChangeFeed.readAppended(spark, ch).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val minus = ChangeFeed.readRemoved(spark, ch).select("id", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    plus.count(_._2.startsWith("new")) shouldBe 5
    minus.count(t => t._2.startsWith("old") && t._1 >= 5L && t._1 <= 9L) shouldBe 5
  }

  test("upsert: matched editions replaced, unmatched inserted, untouched files not rewritten") {
    val leaf = new File(root, "basic"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 50L).map(i => (i, s"old$i")))
    writeFile(leaf, "b.parquet", (51L to 100L).map(i => (i, s"old$i")))
    commitAll(leafPath)
    val liveBefore = ManifestCommit.liveFiles(spark, leafPath).toSet

    // updates hit ONLY a.parquet (ids ≤ 50); 200-series rows are inserts
    val source = (10L to 20L).map(i => (i, s"new$i")) ++ Seq((201L, "ins"), (202L, "ins"))
    val r = ManifestCommit.merge(spark, leafPath, df(source), Seq("id"), cfg).get
    withClue(r) { r.success shouldBe true }
    r.rowsWritten shouldBe 50L - 11L + 13L // a's survivors + the whole source

    bag(leafPath) shouldBe
      ((1L to 9L) ++ (21L to 100L)).map(i => (i, s"old$i")).++(source).sortBy(t => (t._1, t._2))
    val liveAfter = ManifestCommit.liveFiles(spark, leafPath).toSet
    // b.parquet untouched; a.parquet superseded
    (liveBefore -- liveAfter).map(p => new File(p).getName) shouldBe Set("a.parquet")
    liveAfter.map(p => new File(p).getName) should contain("b.parquet")
  }

  test("pure insert (no matched keys) publishes as an append — nothing superseded") {
    val leaf = new File(root, "insert"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 30L).map(i => (i, s"old$i")))
    commitAll(leafPath)
    val liveBefore = ManifestCommit.liveFiles(spark, leafPath).toSet
    val cursor = ChangeFeed.Cursor.atHead(spark, leafPath)

    ManifestCommit.merge(spark, leafPath, df(Seq((500L, "x"), (501L, "y"))), Seq("id"), cfg)
      .get.success shouldBe true
    ManifestCommit.liveFiles(spark, leafPath).toSet should contain allElementsOf liveBefore
    bag(leafPath).size shouldBe 32

    // feed shape: a plain append window — no retractions to replay
    val ch = ChangeFeed.changesSince(spark, leafPath, cursor)
    ch.mode shouldBe "walk"
    ch.removed shouldBe Seq.empty
    ChangeFeed.readAppended(spark, ch).count() shouldBe 2L
  }

  test("NULL keys: a NULL-key source row always inserts; a NULL-key target row always survives") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "nulls"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val tmp = new File(leaf, ".tmp-n")
    Seq((Some(1L), "t1"), (None: Option[Long], "tnull"), (Some(3L), "t3"))
      .toDF("id", "v").coalesce(1).write.parquet(tmp.getAbsolutePath)
    Files.move(
      tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      new File(leaf, "n.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    commitAll(leafPath)

    val source = Seq((Some(1L), "u1"), (None: Option[Long], "snull")).toDF("id", "v")
    ManifestCommit.merge(spark, leafPath, source, Seq("id"), cfg).get.success shouldBe true
    val got = ManifestCommit.readLeaf(spark, leafPath).select("id", "v").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).sorted.toSeq
    got shouldBe Seq((-1L, "snull"), (-1L, "tnull"), (1L, "u1"), (3L, "t3")).sorted
  }

  test("a key-duplicated source is refused loudly; an empty source is a no-op") {
    val leaf = new File(root, "dups"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", Seq((1L, "x")))
    commitAll(leafPath)
    val head = ManifestCommit.currentSeq(spark, leafPath)
    val ex = intercept[IllegalArgumentException] {
      ManifestCommit.merge(spark, leafPath, df(Seq((7L, "a"), (7L, "b"))), Seq("id"), cfg)
    }
    ex.getMessage should include("not key-unique")
    // a NULL-key row must not absorb a duplicate: uniqueness is
    // counted over the non-null-key population only (review catch —
    // the first cut compared against srcRows − nullKeyRows and one
    // null-key row masked one genuine duplicate)
    val s2 = spark
    import s2.implicits._
    val masked = Seq((Some(7L), "a"), (Some(7L), "b"), (None: Option[Long], "c")).toDF("id", "v")
    intercept[IllegalArgumentException] {
      ManifestCommit.merge(spark, leafPath, masked, Seq("id"), cfg)
    }.getMessage should include("not key-unique")
    ManifestCommit.merge(spark, leafPath, df(Seq.empty), Seq("id"), cfg) shouldBe None
    ManifestCommit.currentSeq(spark, leafPath) shouldBe head
  }

  test("merge folds an outstanding MoR delete sidecar: retracted rows neither match nor resurrect") {
    val leaf = new File(root, "mor"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 40L).map(i => (i, s"old$i")))
    commitAll(leafPath)
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") <= 10L, cfg).get.success shouldBe true

    // source updates ids 5..15: 5..10 are retracted (insert as new), 11..15 replace
    val source = (5L to 15L).map(i => (i, s"new$i"))
    val r = ManifestCommit.merge(spark, leafPath, df(source), Seq("id"), cfg).get
    withClue(r) { r.success shouldBe true }
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty // consumed by the rewrite
    bag(leafPath) shouldBe
      ((16L to 40L).map(i => (i, s"old$i")) ++ source).sortBy(t => (t._1, t._2))
  }

  test("the feed replays a merge as retract+assert; an IndexStore synced through it probes like a one-shot") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "feed"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    // doc corpus shape for the index consumer
    val tmp = new File(leaf, ".tmp-d")
    (1L to 30L).map(i => (i, s"alpha beta doc$i")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(tmp.getAbsolutePath)
    Files.move(
      tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      new File(leaf, "d.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ManifestCommit.publish(
      FileIndexer.fsFor(spark, leafPath), leafPath, "arr", "drun0",
      inputsRel = Seq(), outputsRel = Seq("d.parquet"), rows = 30L)

    val idx = new File(root, "feed-idx").getAbsolutePath
    graft.operators.IndexStore.syncFromLeaf(spark, leafPath, idx)

    // upsert: docs 1..5 re-worded (gamma instead of beta), 31..33 new
    val source = ((1L to 5L).map(i => (i, s"alpha gamma doc$i")) ++
      (31L to 33L).map(i => (i, s"alpha beta doc$i"))).toDF("doc_id", "text")
    val cursor = ChangeFeed.Cursor.atHead(spark, leafPath)
    ManifestCommit.merge(spark, leafPath, source, Seq("doc_id"), cfg).get.success shouldBe true

    val ch = ChangeFeed.changesSince(spark, leafPath, cursor)
    ch.mode shouldBe "walk"
    ChangeFeed.readRemoved(spark, ch).count() shouldBe 30L // retract the old editions
    ChangeFeed.readAppended(spark, ch).count() shouldBe 33L // assert the new state

    graft.operators.IndexStore.syncFromLeaf(spark, leafPath, idx)
    // the synced index must score byte-identically to a one-shot index
    // over the leaf's CURRENT rows — updates tombstoned the old
    // editions, re-adds score from the new text (beta's df dropped by 5)
    val oneShot = new File(root, "feed-idx-oneshot").getAbsolutePath
    graft.operators.IndexStore.build(spark, ManifestCommit.readLeaf(spark, leafPath), oneShot)
    val got = graft.operators.IndexStore.search(spark, idx, Seq("beta", "gamma")).collect().map(_.toString).toSeq
    val want = graft.operators.IndexStore.search(spark, oneShot, Seq("beta", "gamma")).collect().map(_.toString).toSeq
    got shouldBe want
  }
}
