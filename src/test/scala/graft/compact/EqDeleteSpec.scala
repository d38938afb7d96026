package graft.compact

import java.io.File
import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `ManifestCommit.deleteKeysMoR` — keyed retention deletes as EQUALITY
  * sidecars (the zero-data-read half of the merge-on-read algebra):
  * commit = key tuples + bloom-resolved scope, reads anti-join scope
  * rows on the keys, compaction folds/reseals, and the feed replays the
  * exact retraction set (prior/refs exclusions — never a double
  * retract).
  */
class EqDeleteSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-eqdel").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def writeFile(leaf: File, name: String, ids: Seq[Long], tag: String): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    ids.map(i => (i, s"d$i", tag)).toDF("id", "doc", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
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
          fs, leafPath, s"arr$i", s"eqrun$i",
          inputsRel = Seq.empty, outputsRel = Seq(new org.apache.hadoop.fs.Path(f).getName),
          rows = spark.read.parquet(f).count(),
        )
      }
  }

  private def bag(leaf: String): Seq[(Long, String, String)] =
    ManifestCommit.readLeaf(spark, leaf).select("id", "doc", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq

  private def keysDf(docs: Seq[String]) = {
    val s = spark
    import s.implicits._
    docs.toDF("doc")
  }

  /** Clobber header and footer IN PLACE (length preserved — a shrunken
    * file would leave stale lengths in Spark's shared FileStatusCache
    * and poison the post-restore reads).
    */
  private def corrupt(path: String): Array[Byte] = {
    val f = new File(path)
    val orig = Files.readAllBytes(f.toPath)
    val bad = orig.clone()
    val n = bad.length
    (math.max(0, n - 16) until n).foreach(i => bad(i) = 0x5a)
    (0 until math.min(64, n)).foreach(i => bad(i) = 0x5a)
    Files.write(f.toPath, bad)
    orig
  }

  private def restore(path: String, bytes: Array[Byte]): Unit = {
    Files.write(new File(path).toPath, bytes)
    ()
  }

  test("the commit writes keys+scope only (succeeds over fully CORRUPTED data), reads equal the position path, and a later same-key append survives") {
    val leaf = new File(root, "basic"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 100L, "a")
    writeFile(leaf, "b.parquet", 101L to 200L, "b")
    commitAll(leafPath)
    val before = bag(leafPath)

    // the zero-read proof: every data byte on the leaf is garbage while
    // the commit runs — a position delete MUST read candidates to
    // resolve ordinals; this commit cannot be reading anything
    val live = ManifestCommit.liveFiles(spark, leafPath)
    val saved = live.map(p => p -> corrupt(p))
    val r = ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d10", "d110", "dNOPE")), cfg)
    saved.foreach { case (p, b) => restore(p, b) }
    withClue(r) { r.get.success shouldBe true }
    r.get.rowsWritten shouldBe 3L // key count, not matched rows — by contract
    val dels = ManifestCommit.liveDeletes(spark, leafPath)
    dels.size should be >= 2 // keys + scope parquet of one sidecar
    all(dels) should include("/.eqdel-")

    // read equivalence vs the position twin on an identical leaf
    bag(leafPath) shouldBe before.filterNot(t => t._2 == "d10" || t._2 == "d110")
    val twin = new File(root, "basic-twin"); twin.mkdirs()
    writeFile(twin, "a.parquet", 1L to 100L, "a")
    writeFile(twin, "b.parquet", 101L to 200L, "b")
    commitAll(twin.getAbsolutePath)
    ManifestCommit.deleteWhereMoR(
      spark, twin.getAbsolutePath, col("doc").isin("d10", "d110", "dNOPE"), cfg).get.success shouldBe true
    bag(leafPath) shouldBe bag(twin.getAbsolutePath)

    // SCOPE semantics: a post-delete arrival re-using key d10 is OUTSIDE
    // the recorded scope — the old edition stays dead, the new one lives
    writeFile(leaf, "c.parquet", Seq(10L), "late")
    val fs = FileIndexer.fsFor(spark, leafPath)
    ManifestCommit.publish(fs, leafPath, "late", "eqlate", Seq.empty, Seq("c.parquet"), rows = 1L)
    bag(leafPath) should contain((10L, "d10", "late"))
    bag(leafPath) should not contain ((10L, "d10", "a"))

    // countLeaf resolves the deferred kill count exactly
    ManifestStats.countLeaf(spark, leafPath) shouldBe bag(leafPath).size.toLong
  }

  test("bloom sidecars bound the scope to possible-hit files; a keys frame with only NULL/absent matches no-ops") {
    val leaf = new File(root, "scoped"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val bcfg = cfg.copy(statsColumns = Seq("id"), bloomColumns = Seq("doc"))
    val s = spark
    import s.implicits._
    def ingest(ids: Seq[Long], tag: String): Unit = {
      val df = ids.map(i => (i, s"d$i", tag)).toDF("id", "doc", "tag").coalesce(1)
      WapCommit.writeAuditPublish(spark, leafPath, df, Seq(WapCommit.AuditCheck.notNull("doc")), bcfg)
      ()
    }
    ingest(1L to 100L, "a")
    ingest(101L to 200L, "b")
    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.size shouldBe 2

    val r = ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d150")), bcfg)
    r.get.success shouldBe true
    val (_, eqs) = ManifestCommit.splitSidecarRels(
      ManifestCommit.liveDeletes(spark, leafPath).map(ManifestCommit.relativeTo(leafPath, _)))
    eqs.size shouldBe 1
    val scope = ManifestCommit.eqScopeRels(spark, leafPath, eqs.head)
    // only the second commit's file can hold d150 — its bloom says so
    scope.size shouldBe 1
    spark.read.parquet(s"$leafPath/${scope.head}")
      .where(col("doc") === "d150").count() shouldBe 1L
    bag(leafPath).map(_._2) should not contain "d150"

    // keys that no live bloom can hold → scope empty → NO commit at all
    val seqBefore = ManifestCommit.currentSeq(spark, leafPath)
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("dABSENT")), bcfg) shouldBe None
    val nullKeys = Seq(Option.empty[String]).toDF("doc")
    ManifestCommit.deleteKeysMoR(spark, leafPath, nullKeys, bcfg) shouldBe None
    ManifestCommit.currentSeq(spark, leafPath) shouldBe seqBefore
  }

  test("compaction folds in-plan kills to the rewrite and re-seals the surviving scope; reads stay exact; full fold retires the sidecar") {
    val leaf = new File(root, "fold"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 100L, "a")
    writeFile(leaf, "b.parquet", 101L to 200L, "b")
    commitAll(leafPath)
    ManifestCommit.deleteKeysMoR(
      spark, leafPath, keysDf(Seq("d10", "d20", "d110", "d120")), cfg).get.success shouldBe true
    val expect = bag(leafPath)
    expect.size shouldBe 196

    // rewrite ONLY a.parquet: its kills (d10, d20) drop physically; the
    // sidecar re-seals with scope = [b.parquet] — still an EQ sidecar
    val a = ManifestCommit.liveFiles(spark, leafPath).filter(_.endsWith("a.parquet"))
    val r = ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "part", a, a.map(f => new File(f).length()).sum), cfg)
    withClue(r) { r.success shouldBe true }
    r.rowsWritten shouldBe 98L // delete-aware rewrite
    val resid = ManifestCommit.liveDeletes(spark, leafPath)
    resid should not be empty
    all(resid) should include("/.eqdel-")
    val (_, eqs) = ManifestCommit.splitSidecarRels(resid.map(ManifestCommit.relativeTo(leafPath, _)))
    eqs.size shouldBe 1
    ManifestCommit.eqScopeRels(spark, leafPath, eqs.head) shouldBe Seq("b.parquet")
    bag(leafPath) shouldBe expect

    // folding the rest consumes it whole
    val rest = ManifestCommit.liveFiles(spark, leafPath)
    ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "rest", rest, rest.map(f => new File(f).length()).sum), cfg)
      .success shouldBe true
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty
    bag(leafPath) shouldBe expect
  }

  test("feed exactness: the delete window retracts each row ONCE (prior positions + stacked-equality refs excluded), and the fold window replays consistently") {
    val leaf = new File(root, "feed"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 20L, "a")
    commitAll(leafPath)
    val c0 = ChangeFeed.Cursor.atHead(spark, leafPath)

    // 1) position delete kills the evens
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") % 2 === 0L, cfg).get.success shouldBe true
    val c1 = ChangeFeed.changesSince(spark, leafPath, c0)
    c1.mode shouldBe "walk"
    ChangeFeed.readDeleted(spark, leafPath, c1).select("id").collect().map(_.getLong(0)).sorted shouldBe
      (2L to 20L by 2).toArray

    // 2) equality delete on {d2 (already dead), d3}: retracts ONLY d3
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d2", "d3")), cfg).get.success shouldBe true
    val c2 = ChangeFeed.changesSince(spark, leafPath, c1.next)
    c2.mode shouldBe "walk"
    c2.deleted should not be empty
    ChangeFeed.readDeleted(spark, leafPath, c2).select("id").collect().map(_.getLong(0)) shouldBe Array(3L)

    // 3) second equality delete on {d3 (dead via the ref), d5}: only d5
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d3", "d5")), cfg).get.success shouldBe true
    val c3 = ChangeFeed.changesSince(spark, leafPath, c2.next)
    c3.mode shouldBe "walk"
    ChangeFeed.readDeleted(spark, leafPath, c3).select("id").collect().map(_.getLong(0)) shouldBe Array(5L)
    bag(leafPath).map(_._1) shouldBe (1L to 20L).filter(i => i % 2 == 1 && i != 3L && i != 5L)

    // 4) the fold window: a rewrite touching equality sidecars replays
    // as retract+assert — the four-term fold lands exactly on the bag
    val files = ManifestCommit.liveFiles(spark, leafPath)
    ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "fold", files, files.map(f => new File(f).length()).sum), cfg)
      .success shouldBe true
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty
    val c4 = ChangeFeed.changesSince(spark, leafPath, c3.next)
    c4.mode shouldBe "walk"
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      if (df.columns.isEmpty) Seq.empty else df.select("id").collect().map(_.getLong(0)).toSeq
    val plus = ids(ChangeFeed.readAppended(spark, c4)) ++ ids(ChangeFeed.readRestored(spark, leafPath, c4))
    val minus = ids(ChangeFeed.readRemoved(spark, c4)) ++ ids(ChangeFeed.readDeleted(spark, leafPath, c4))
    // multiset fold: consumer state after = state before + plus - minus
    val beforeState = bag(leafPath).map(_._1) // bag unchanged by the fold
    val folded = (beforeState ++ plus).diff(minus).sorted
    folded shouldBe bag(leafPath).map(_._1).sorted
  }

  test("a materialized aggregate refreshes exactly across equality-delete and fold windows") {
    val leaf = new File(root, "agg"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 100L, "a")
    writeFile(leaf, "b.parquet", 101L to 200L, "b")
    commitAll(leafPath)
    val aggPath = new File(root, "agg-state").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggPath, keys = Seq("tag"), values = Seq("id"))

    def check(p: String = aggPath): Unit = {
      val got = MaterializedAgg.read(spark, p)
        .select("tag", "cnt", "sum_id").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      val want = ManifestCommit.readLeaf(spark, leafPath)
        .groupBy("tag").agg(count(lit(1)).as("cnt"), sum("id").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
      got shouldBe want
    }

    ManifestCommit.deleteKeysMoR(
      spark, leafPath, keysDf(Seq("d7", "d77", "d177")), cfg).get.success shouldBe true
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("tag"), Seq("id"))
    check()
    // a FULL build while the eq sidecar is outstanding (review-round-16
    // catch: readWithFileAware resolved sidecars position-only — an
    // eq-only backlog crashed it and a mixed one silently KEPT the
    // eq-deleted rows in the sealed state)
    val aggFresh = new File(root, "agg-state-post").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggFresh, keys = Seq("tag"), values = Seq("id"))
    check(aggFresh)
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") === 42L, cfg).get.success shouldBe true
    val aggMixed = new File(root, "agg-state-mixed").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggMixed, keys = Seq("tag"), values = Seq("id"))
    check(aggMixed)

    // partial fold (reseal) then full fold — refresh stays exact
    val a = ManifestCommit.liveFiles(spark, leafPath).filter(_.endsWith("a.parquet"))
    ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "p", a, a.map(f => new File(f).length()).sum), cfg).success shouldBe true
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("tag"), Seq("id"))
    check()
    val rest = ManifestCommit.liveFiles(spark, leafPath)
    ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "r", rest, rest.map(f => new File(f).length()).sum), cfg).success shouldBe true
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("tag"), Seq("id"))
    check()
  }

  test("a fold's reseal keeps its refs RESOLVABLE under default GC: the referenced consumed sidecar's files survive as a retention dependency") {
    val leaf = new File(root, "refs-gc"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 50L, "a")
    writeFile(leaf, "b.parquet", 51L to 100L, "b")
    commitAll(leafPath)
    val gcCfg = cfg.copy(retainSuperseded = false)
    // E1 kills d60 (lives in b); E2 = {d60 (dead via E1), d70} refs E1
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d60")), gcCfg).get.success shouldBe true
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d60", "d70")), gcCfg).get.success shouldBe true
    val (_, eqsBefore) = ManifestCommit.splitSidecarRels(
      ManifestCommit.liveDeletes(spark, leafPath).map(ManifestCommit.relativeTo(leafPath, _)))
    val e2 = eqsBefore.find(e => ManifestCommit.eqRefs(spark, leafPath, e).nonEmpty).get
    val refStem = ManifestCommit.eqRefs(spark, leafPath, e2).head

    // fold ONLY a.parquet with default (non-retaining) GC: both
    // sidecars are consumed + resealed; the reseal of E2 still refs
    // E1's ORIGINAL dirs — which the review-caught first cut deleted
    val a = ManifestCommit.liveFiles(spark, leafPath).filter(_.endsWith("a.parquet"))
    ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "part", a, a.map(f => new File(f).length()).sum), gcCfg)
      .success shouldBe true
    new File(leaf, s"$refStem-keys").exists() shouldBe true // retention dependency survived GC
    new File(leaf, s"$refStem-scope").exists() shouldBe true

    // the reseal's retraction rows resolve EXACTLY: d70 only (d60 was
    // dead via the referenced sidecar), and they resolve WITHOUT error
    val resid = ManifestCommit.liveDeletes(spark, leafPath)
    val (_, eqsAfter) = ManifestCommit.splitSidecarRels(
      resid.map(ManifestCommit.relativeTo(leafPath, _)))
    val e2r = eqsAfter.find(e => ManifestCommit.eqRefs(spark, leafPath, e).contains(refStem)).get
    ManifestCommit.deleteRowsReadable(
      spark, leafPath, e2r.allFiles.map(r => s"$leafPath/$r")) shouldBe true
    ManifestCommit.readDeleteRows(spark, leafPath, e2r.allFiles.map(r => s"$leafPath/$r"))
      .select("doc").collect().map(_.getString(0)) shouldBe Array("d70")
    bag(leafPath).map(_._2).filter(Set("d60", "d70")) shouldBe Seq.empty
  }

  test("the eq fold dial acts past maxSidecars: one compaction retires the whole stacked backlog (refs chains included), reads identical") {
    val leaf = new File(root, "eqdial"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 60L, "a")
    commitAll(leafPath)
    // a stacked retention cadence: each delete refs its predecessors
    Seq("d5", "d15", "d25").foreach { k =>
      ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq(k)), cfg).get.success shouldBe true
    }
    ManifestCommit.liveEqDeleteCount(spark, leafPath) shouldBe 3
    val expect = bag(leafPath)

    // below the dial threshold: no-op
    graft.operators.StoreMaintenance.maintainEqDeleteSidecars(spark, leafPath, cfg, maxSidecars = 4)
      .compacted shouldBe false
    ManifestCommit.liveEqDeleteCount(spark, leafPath) shouldBe 3

    // past it: ONE fold retires every sidecar; the bag is untouched
    graft.operators.StoreMaintenance.maintainEqDeleteSidecars(spark, leafPath, cfg, maxSidecars = 2)
      .compacted shouldBe true
    ManifestCommit.liveEqDeleteCount(spark, leafPath) shouldBe 0
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty
    bag(leafPath) shouldBe expect
    bag(leafPath).map(_._2).filter(Set("d5", "d15", "d25")) shouldBe Seq.empty
  }

  test("tripwires and lifecycle: a racing rewrite that did not fold the sidecar aborts; crashed stages are invisible and gcOrphans reclaims them") {
    val leaf = new File(root, "race"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 50L, "a")
    writeFile(leaf, "b.parquet", 51L to 100L, "b")
    commitAll(leafPath)

    // racing rewrite: planned (fold computed) BEFORE the equality delete
    // commits — publish must refuse, the deleted row must stay dead
    val files = ManifestCommit.liveFiles(spark, leafPath)
    val fs = FileIndexer.fsFor(spark, leafPath)
    val st0 = ManifestCommit.resolveState(fs, leafPath, fs.listStatus(new org.apache.hadoop.fs.Path(leafPath)))
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d25")), cfg).get.success shouldBe true
    val ex = intercept[java.io.IOException] {
      ManifestCommit.publish(
        fs, leafPath, "race", "racerun",
        inputsRel = files.map(ManifestCommit.relativeTo(leafPath, _)),
        outputsRel = Seq.empty, rows = 100L,
        knownDeletes = Some(st0.deletes.toSet),
      )
    }
    ex.getMessage should include(".eqdel-")
    bag(leafPath).map(_._2) should not contain "d25"

    // crashed commit: keys+scope staged, no manifest → invisible, reclaimed
    val before = bag(leafPath)
    val s = spark
    import s.implicits._
    Seq("dX").toDF("doc").coalesce(1).write.parquet(s"$leafPath/.eqdel-deadbeef-keys")
    Seq("a.parquet").toDF(ManifestCommit.EqScope).coalesce(1).write.parquet(s"$leafPath/.eqdel-deadbeef-scope")
    ManifestCommit.liveDeletes(spark, leafPath).exists(_.contains("deadbeef")) shouldBe false
    bag(leafPath) shouldBe before
    ManifestCommit.gcOrphans(spark, leafPath) should be >= 2
    new File(leaf, ".eqdel-deadbeef-keys").exists() shouldBe false
    new File(leaf, ".eqdel-deadbeef-scope").exists() shouldBe false
  }

  test("a key column that resolves against no live file is refused loudly; a case-variant key resolves") {
    val leaf = new File(root, "keycols"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 20L, "a")
    commitAll(leafPath)
    // the hazard: a typoed key NULL-pads through the schema-evolution
    // guard, the delete matches nothing, yet the sealed sidecar would
    // tax every read and requiresLive-pin the scope forever
    val s = spark
    import s.implicits._
    val ex = intercept[IllegalArgumentException] {
      ManifestCommit.deleteKeysMoR(spark, leafPath, Seq("d5").toDF("doc_uid"), cfg)
    }
    ex.getMessage should include("doc_uid")
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty
    // session resolution is case-insensitive — a case-variant spelling
    // is the SAME column, not a typo
    val r = ManifestCommit.deleteKeysMoR(spark, leafPath, Seq("d5").toDF("DOC"), cfg)
    withClue(r) { r.get.success shouldBe true }
    bag(leafPath).map(_._2) should not contain "d5"
  }

  test("the key anti/semi joins broadcast below the cap and fall back to a shuffle join above it") {
    val leaf = new File(root, "bcast"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 50L, "a")
    commitAll(leafPath)
    ManifestCommit.deleteKeysMoR(spark, leafPath, keysDf(Seq("d3", "d4")), cfg).get.success shouldBe true
    // churn-sized sidecar: the hint forces a broadcast join even with
    // auto-broadcast off (the common retention batch never shuffles)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = ManifestCommit.readLeaf(spark, leafPath).queryExecution.executedPlan.toString
      plan should include("BroadcastHashJoin")
      // above the cap the hint is omitted: with auto-broadcast off the
      // same join plans as a shuffle join — never a driver-side collect
      // of an arbitrarily large key frame into a broadcast
      val (_, eqs) = ManifestCommit.splitSidecarRels(
        ManifestCommit.liveDeletes(spark, leafPath).map(ManifestCommit.relativeTo(leafPath, _)))
      val keys = ManifestCommit.readEqKeys(spark, leafPath, eqs.head)
      ManifestCommit.eqKeyBytesOf(spark, leafPath, eqs.head) should be < ManifestCommit.EqBroadcastKeyBytesCap
      val big = ManifestCommit.antiJoinKeysGuarded(
        ManifestCommit.readWithPos(spark, leafPath, ManifestCommit.liveFiles(spark, leafPath)),
        keys, keyBytes = ManifestCommit.EqBroadcastKeyBytesCap + 1)
      val bigPlan = big.queryExecution.executedPlan.toString
      bigPlan should not include "BroadcastHashJoin"
      val small = ManifestCommit.antiJoinKeysGuarded(
        ManifestCommit.readWithPos(spark, leafPath, ManifestCommit.liveFiles(spark, leafPath)),
        keys, keyBytes = 1024L)
      small.queryExecution.executedPlan.toString should include("BroadcastHashJoin")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("eqKeyBytesOf saturates on unknown-size key files: two unreadable statuses never overflow into a forced broadcast") {
    val leaf = new File(root, "satsum"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    // two key files whose getFileStatus fails (they don't exist): each
    // contributes the Long.MaxValue sentinel, and a plain .sum would
    // wrap to -2 — BELOW the cap, forcing the broadcast the sentinel
    // exists to prevent (advice r17). The fold must saturate instead.
    val ghost = ManifestCommit.EqSidecar(
      stemId = "ghost",
      keyFiles = Seq(".eqdel-ghost/k1.parquet", ".eqdel-ghost/k2.parquet"),
      scopeFiles = Seq.empty, priorFiles = Seq.empty, refFiles = Seq.empty)
    ManifestCommit.eqKeyBytesOf(spark, leafPath, ghost) shouldBe Long.MaxValue
    // one unknown plus one real size saturates too (MaxValue + n > 0 was
    // the other wrap shape)
    writeFile(leaf, "real.parquet", 1L to 5L, "r")
    val fs = FileIndexer.fsFor(spark, leafPath)
    val realLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$leafPath/real.parquet")).getLen
    realLen should be > 0L
    val mixed = ghost.copy(keyFiles = Seq("real.parquet", ".eqdel-ghost/k1.parquet"))
    ManifestCommit.eqKeyBytesOf(spark, leafPath, mixed) shouldBe Long.MaxValue
  }
}
