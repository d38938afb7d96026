package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `SyncTick.tick` — one lifecycle tick drives the search index AND
  * N materialized aggregates of one leaf off a SINGLE ChangeFeed
  * window: all consumers land on the leaf's head seq, and the window's
  * bytes feed every fold once (the seeded-cache proof below).
  */
class SyncTickSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-synctick").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  /** Commit one doc batch: (doc_id, text, toks = token count). */
  private def appendDocs(leafPath: String, name: String, lo: Long, hi: Long): Unit = {
    val s = spark
    import s.implicits._
    val leaf = new File(leafPath)
    val tmp = new File(leaf, s".tmp-$name")
    (lo to hi).map(i => (i, s"alpha beta doc$i", 3L))
      .toDF("doc_id", "text", "toks").coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, s"$name.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ManifestCommit.publish(
      FileIndexer.fsFor(spark, leafPath), leafPath, s"arr-$name", s"tick$name",
      inputsRel = Seq(), outputsRel = Seq(s"$name.parquet"), rows = hi - lo + 1)
  }

  test("one tick lands the index and two agg states on the leaf's head, exact through arrival + MoR delete + fold") {
    val leaf = new File(root, "leaf"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val idx = new File(root, "idx").getAbsolutePath
    appendDocs(leafPath, "a", 1L, 40L)

    // bootstrap each consumer through its own API (first contact is a
    // full read however driven)
    graft.operators.IndexStore.syncFromLeaf(spark, leafPath, idx)
    // two states, different shapes, same leaf — the N-dashboard case
    val aggA = new File(root, "aggA").getAbsolutePath
    val aggB = new File(root, "aggB").getAbsolutePath
    val specA = MaterializedAgg.AggSpec(aggA, Seq("toks"), Seq("doc_id"))
    val specB = MaterializedAgg.AggSpec(aggB, Seq("toks"), Seq("doc_id"), sumSq = Seq("doc_id"))
    MaterializedAgg.build(spark, leafPath, aggA, Seq("toks"), Seq("doc_id"))
    MaterializedAgg.build(spark, leafPath, aggB, Seq("toks"), Seq("doc_id"), sumSq = Seq("doc_id"))

    // the window: an arrival, a MoR retention delete, and the physical
    // fold — every term class the feed can carry
    appendDocs(leafPath, "b", 41L, 60L)
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("doc_id") % 10 === 0L, cfg)
      .get.success shouldBe true
    val files = ManifestCommit.liveFiles(spark, leafPath)
    ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "fold", files, files.map(f => new File(f).length()).sum), cfg)
      .success shouldBe true

    val r = SyncTick.tick(spark, leafPath, Seq(specA, specB), Some(idx))
    val head = ManifestCommit.currentSeq(spark, leafPath)
    r.leafSeq shouldBe head
    r.agg.foreach(_.seq shouldBe head)
    graft.operators.IndexStore.feedCursor(spark, idx).get.seq shouldBe head
    r.indexMode shouldBe Some(r.mode)

    // exactness: both agg states equal a direct aggregate; the index
    // probes byte-identically to a one-shot over the current corpus
    val direct = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("toks").agg(count(lit(1)).as("cnt"), sum(col("doc_id")).as("sum_doc_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    MaterializedAgg.read(spark, aggA)
      .select("toks", "cnt", "sum_doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet shouldBe direct
    val oneShot = new File(root, "idx-oneshot").getAbsolutePath
    graft.operators.IndexStore.build(
      spark, ManifestCommit.readLeaf(spark, leafPath).select("doc_id", "text"), oneShot)
    graft.operators.IndexStore.search(spark, idx, Seq("beta")).collect().map(_.toString).toSeq shouldBe
      graft.operators.IndexStore.search(spark, oneShot, Seq("beta")).collect().map(_.toString).toSeq

    // an immediately-following tick is a noop everywhere
    val r2 = SyncTick.tick(spark, leafPath, Seq(specA, specB), Some(idx))
    r2.mode shouldBe "noop"
    r2.agg.foreach(_.mode shouldBe "noop")
  }

  test("the seeded delta cache IS what the fold consumes: a sentinel seed frame visibly feeds the refresh") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "seed-leaf"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    appendDocs(leafPath, "s1", 1L, 30L)
    val aggPath = new File(root, "agg-seed").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("toks"), Seq("doc_id"))

    appendDocs(leafPath, "s2", 31L, 40L)
    val added = (ManifestCommit.liveFiles(spark, leafPath).toSet --
      recordedOf(aggPath)).toSeq.sorted
    added.size shouldBe 1

    // seed the EXACT window key with sentinel rows that are NOT in the
    // file: if the refresh read the file, the state would show the true
    // rows; it shows the sentinel — proving the seeded frame (the
    // tick's one materialized read) fed the fold
    val sentinel = Seq((999L, "x", 3L, "f")).toDF("doc_id", "text", "toks", "_file").persist()
    sentinel.count()
    try {
      MaterializedAgg.refreshAll(
        spark, leafPath, Seq(MaterializedAgg.AggSpec(aggPath, Seq("toks"), Seq("doc_id"))),
        seedData = Map(added -> sentinel),
      ).head.mode shouldBe "walk"
      val got = MaterializedAgg.read(spark, aggPath)
        .select("toks", "cnt", "sum_doc_id")
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
      // 30 original rows + ONE sentinel row (doc_id 999), not ten 31..40
      got shouldBe Set((3L, 31L, (1L to 30L).sum + 999L))
    } finally { sentinel.unpersist(); () }
  }

  private def recordedOf(aggPath: String): Set[String] = {
    val dir = new File(aggPath)
    val f = dir.listFiles().find(_.getName.startsWith("files-")).get
    java.nio.file.Files.readString(f.toPath).split("\n").filter(_.nonEmpty).toSet
  }

  test("Compactor lifecycle: ONE run() advances leaf + materialized agg + search index (GRAFT_SYNC_INDEX wiring)") {
    val s = spark
    import s.implicits._
    val lifecycleRoot = new File(root, "lifecycle"); lifecycleRoot.mkdirs()
    val leaf = new File(lifecycleRoot, "acct/source=sync/year=2026/month=01"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val staleMs = java.sql.Timestamp.valueOf("2026-06-01 00:00:00").getTime
    def drop(name: String, lo: Long, hi: Long): Unit = {
      val tmp = new File(leaf, s".tmp-$name")
      (lo to hi).map(i => (i, s"alpha beta doc$i", 3L))
        .toDF("doc_id", "text", "toks").coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new File(leaf, s"$name.parquet").toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      new File(leaf, s"$name.parquet").setLastModified(staleMs); ()
    }
    drop("a", 1L, 30L); drop("b", 31L, 60L)
    val cfg = Main.configFromEnv(Map(
      "GRAFT_COMMIT_MODE" -> "manifest",
      "GRAFT_MATAGG_ROOT" -> new File(root, "lc-agg").getAbsolutePath,
      "GRAFT_MATAGG_KEYS" -> "toks",
      "GRAFT_MATAGG_VALUES" -> "doc_id",
      "GRAFT_SYNC_INDEX" -> new File(root, "lc-idx").getAbsolutePath,
    )).copy(
      asOf = Some(java.time.LocalDate.parse("2026-06-20")),
      retainSuperseded = true,
    )
    cfg.syncIndexRoot should not be empty

    val r1 = Compactor.run(spark, lifecycleRoot.getAbsolutePath, cfg)
    r1.size shouldBe 1
    r1.foreach(x => withClue(x) { x.success shouldBe true })
    // store names key on the leaf SPELLING the run loop saw (the
    // fs-qualified LeafResult.leaf), not the raw local path
    val qLeaf = r1.head.leaf
    val aggPath = MaterializedAgg.pathFor(cfg.matAggRoot.get, qLeaf)
    val idxPath = MaterializedAgg.pathFor(cfg.syncIndexRoot.get, qLeaf)
    MaterializedAgg.exists(spark, aggPath) shouldBe true
    graft.operators.IndexStore.feedCursor(spark, idxPath) should not be empty

    // second round: fresh arrivals → compaction commit → the tick
    // drives BOTH consumers from one window to the new head
    drop("c", 61L, 90L); drop("d", 91L, 120L)
    Compactor.run(spark, lifecycleRoot.getAbsolutePath, cfg)
      .foreach(x => withClue(x) { x.success shouldBe true })
    val head = ManifestCommit.currentSeq(spark, leafPath)
    graft.operators.IndexStore.feedCursor(spark, idxPath).get.seq shouldBe head

    val direct = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("toks").agg(count(lit(1)).as("cnt"), sum(col("doc_id")).as("sum_doc_id"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    MaterializedAgg.read(spark, aggPath)
      .select("toks", "cnt", "sum_doc_id")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet shouldBe direct
    val oneShot = new File(root, "lc-idx-oneshot").getAbsolutePath
    graft.operators.IndexStore.build(
      spark, ManifestCommit.readLeaf(spark, leafPath).select("doc_id", "text"), oneShot)
    graft.operators.IndexStore.search(spark, idxPath, Seq("beta")).collect().map(_.toString).toSeq shouldBe
      graft.operators.IndexStore.search(spark, oneShot, Seq("beta")).collect().map(_.toString).toSeq
  }
}
