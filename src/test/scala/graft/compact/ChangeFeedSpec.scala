package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import ChangeFeed._
import WapCommit.AuditCheck

/** The public change feed: walk-mode windows carry net row changes
  * (pure compaction nets to zero), degraded windows fall back to an
  * exact file-level diff, and a consumer folding ⊕appended ⊖removed
  * across ANY interleaving of appends / compactions / rewrites /
  * checkpoints equals a from-scratch read of the leaf.
  */
class ChangeFeedSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private var root: File = _
  private val cfg = CompactorConfig(
    maxRowsPerFile = 100L,
    commitMode = CommitMode.Manifest,
    retainSuperseded = true, // keep the ⊖ side readable for the consumer
  )
  private val gate = Seq(AuditCheck.notNull("k"))

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-changefeed").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def leaf(name: String): String = {
    val d = new File(root, name); d.mkdirs(); d.getAbsolutePath
  }

  private def batch(lo: Int, hi: Int) = {
    val s = spark
    import s.implicits._
    (lo to hi).map(i => (i.toLong, s"k${i % 3}")).toDF("id", "k")
  }

  private def append(l: String, lo: Int, hi: Int): Unit =
    WapCommit.writeAuditPublish(spark, l, batch(lo, hi), gate, cfg) match {
      case c: WapCommit.WapCommitted => ()
      case other                     => fail(s"append rejected: $other")
    }

  private def compactAll(l: String): Unit = {
    val files = ManifestCommit.liveFiles(spark, l)
    val r = ManifestCommit.mergeAndCommit(
      spark, LeafPlan(l, "cf", files, files.map(f => new File(f).length()).sum), cfg,
    )
    withClue(r)(r.success shouldBe true)
  }

  test("append windows walk; a pure-compaction window nets to ZERO files") {
    val l = leaf("walk")
    append(l, 1, 250) // 3 files at the 100-row cap
    val c1 = changesSince(spark, l, Cursor.initial)
    c1.mode shouldBe "walk"
    c1.removed shouldBe Seq.empty
    readAppended(spark, c1).count() shouldBe 250L

    append(l, 251, 300)
    val c2 = changesSince(spark, l, c1.next)
    c2.mode shouldBe "walk"
    readAppended(spark, c2).count() shouldBe 50L
    readAppended(spark, c2).agg(min("id"), max("id")).head.toSeq shouldBe Seq(251L, 300L)

    compactAll(l) // row-preserving rewrite
    val c3 = changesSince(spark, l, c2.next)
    c3.mode shouldBe "walk"
    withClue(c3)(c3.isEmpty shouldBe true) // the whole point: zero bytes across churn
    c3.next.seq shouldBe c2.next.seq + 1

    changesSince(spark, l, c3.next).mode shouldBe "noop"
  }

  test("a row-changing rewrite walks as ⊕outputs ⊖inputs; the fold matches a recount") {
    val s = spark
    import s.implicits._
    val l = leaf("rewrite")
    append(l, 1, 200)
    val c1 = changesSince(spark, l, Cursor.initial)

    // hand-seal a DELETE-WHERE: rewrite the leaf minus id <= 50
    val live = ManifestCommit.liveFiles(spark, l)
    val runId = java.util.UUID.randomUUID().toString.replace("-", "")
    val dataDir = s"$l/.data-$runId"
    spark.read.parquet(live: _*).where(col("id") > 50).write.parquet(dataDir)
    val fs = FileIndexer.fsFor(spark, l)
    val outs = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(p => s".data-$runId/${p.getPath.getName}").sorted.toSeq
    ManifestCommit.publish(
      fs, l, "delete", runId,
      inputsRel = live.map(ManifestCommit.relativeTo(l, _)),
      outputsRel = outs, rows = 150L,
    )

    val c2 = changesSince(spark, l, c1.next)
    c2.mode shouldBe "walk"
    c2.appended should not be empty
    c2.removed.toSet shouldBe live.toSet
    // consumer fold: previous count + appended - removed == recount
    val folded = 200L + readAppended(spark, c2).count() - readRemoved(spark, c2).count()
    folded shouldBe ManifestCommit.readLeaf(spark, l).count()
    folded shouldBe 150L
  }

  test("a cursor whose counted set ran ahead of its seq never re-delivers the straddling commit") {
    // the (currentSeq, liveFiles) reads are not one atomic snapshot: a
    // commit sealing between them yields cursor(seq=T, counted=live(T+1)).
    // The walk must refuse to re-apply T+1 (its outputs are already
    // counted) and the diff must deliver NOTHING — double-delivery here
    // doubles a downstream index's postings silently.
    val l = leaf("race")
    append(l, 1, 50)
    val seqT = ManifestCommit.currentSeq(spark, l)
    append(l, 51, 100) // the commit that "sealed between the two reads"
    val skewed = ChangeFeed.Cursor(seqT, ManifestCommit.liveFiles(spark, l).toSet)
    val ch = ChangeFeed.changesSince(spark, l, skewed)
    ch.appended shouldBe Seq.empty
    ch.removed shouldBe Seq.empty
    ch.next.seq shouldBe ManifestCommit.currentSeq(spark, l)
    // and from the REPAIRED cursor, polling is a clean noop
    ChangeFeed.changesSince(spark, l, ch.next).mode shouldBe "noop"
  }

  test("an append superseded-and-GC'd inside one window degrades to diff instead of wedging the consumer") {
    // non-retaining leaf: commit N appends f, commit N+1 compacts f away
    // and deletes it. A lagging consumer's walk would name the dead f on
    // the ⊕ side — readAppended would throw on every retry, forever.
    // The existence guard must push the window to diff, whose ⊕ side
    // names only live files.
    val noRetain = cfg.copy(retainSuperseded = false)
    val l = leaf("gcwedge")
    WapCommit.writeAuditPublish(spark, l, batch(1, 40), gate, noRetain)
    val cursor = ChangeFeed.Cursor.atHead(spark, l)
    WapCommit.writeAuditPublish(spark, l, batch(41, 80), gate, noRetain) // appends f
    val files = ManifestCommit.liveFiles(spark, l)
    val r = ManifestCommit.mergeAndCommit(
      spark, LeafPlan(l, "cfgc", files, files.map(f => new File(f).length()).sum), noRetain)
    withClue(r)(r.success shouldBe true) // supersedes f and DELETES it
    val ch = ChangeFeed.changesSince(spark, l, cursor)
    ch.mode shouldBe "diff"
    noException should be thrownBy ChangeFeed.readAppended(spark, ch).count()
    // the fold is still exact: cursor.counted ⊕ appended ⊖ removed = live
    (cursor.counted ++ ch.appended -- ch.removed) shouldBe
      ManifestCommit.liveFiles(spark, l).toSet
  }

  test("a raw arrival (no commit) degrades the window to diff and is still reported exactly") {
    val l = leaf("arrival")
    append(l, 1, 100)
    val c1 = changesSince(spark, l, Cursor.initial)

    // drop a file beside the leaf, bypassing the commit log
    val tmp = new File(root, "arrival-tmp")
    batch(101, 120).coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(l, "raw-arrival.parquet").toPath)

    val c2 = changesSince(spark, l, c1.next)
    c2.mode shouldBe "diff"
    c2.appended.map(_.split('/').last) shouldBe Seq("raw-arrival.parquet")
    c2.removed shouldBe Seq.empty
    readAppended(spark, c2).count() shouldBe 20L
    // once counted, the feed recovers walk mode for later commit-gated windows
    append(l, 121, 130)
    val c3 = changesSince(spark, l, c2.next)
    c3.mode shouldBe "walk"
    readAppended(spark, c3).count() shouldBe 10L
  }

  test("a checkpoint inside the window degrades to diff; the fold stays exact") {
    val l = leaf("checkpoint")
    append(l, 1, 100)
    val c1 = changesSince(spark, l, Cursor.initial)
    append(l, 101, 150)
    compactAll(l)
    append(l, 151, 160)
    // fold the early manifests away — the window (c1, head] is no longer walkable
    ManifestCommit.checkpoint(spark, l, beforeSeq = ManifestCommit.currentSeq(spark, l))

    val c2 = changesSince(spark, l, c1.next)
    c2.mode shouldBe "diff"
    val folded = 100L + readAppended(spark, c2).count() - readRemoved(spark, c2).count()
    folded shouldBe ManifestCommit.readLeaf(spark, l).count()
    folded shouldBe 160L
  }

  test("GC'd retractions fail loudly, never under-retract") {
    val l = leaf("gone")
    val noRetain = cfg.copy(retainSuperseded = false)
    WapCommit.writeAuditPublish(spark, l, batch(1, 100), gate, noRetain)
    val c1 = changesSince(spark, l, Cursor.initial)
    val files = ManifestCommit.liveFiles(spark, l)
    val r = ManifestCommit.mergeAndCommit(
      spark, LeafPlan(l, "cf", files, files.map(f => new File(f).length()).sum), noRetain,
    ) // compaction DELETES superseded inputs under noRetain
    r.success shouldBe true

    val c2 = changesSince(spark, l, c1.next)
    // the walk needs input rows it can still price; whether this window
    // walks (nets to zero — nothing to read) or diffs (inputs gone),
    // under-retraction must be impossible
    if (c2.mode == "diff" && c2.removed.nonEmpty) {
      val ex = intercept[java.io.IOException](readRemoved(spark, c2))
      ex.getMessage should include("rebuild")
    } else {
      c2.mode shouldBe "walk"
      c2.isEmpty shouldBe true
    }
  }

  test("seq-only cursor matches the full cursor on a fully commit-gated leaf") {
    val l = leaf("seqonly")
    append(l, 1, 100)
    append(l, 101, 150)
    val mid = 1L // after the first append
    val byCursor = changesSince(
      spark, l,
      Cursor(mid, ManifestCommit.liveFilesAt(spark, l, mid).toSet),
    )
    val bySeq = changesSinceSeq(spark, l, mid)
    bySeq.mode shouldBe byCursor.mode
    bySeq.appended shouldBe byCursor.appended
    bySeq.removed shouldBe byCursor.removed
    readAppended(spark, bySeq).count() shouldBe 50L
  }

  test("end-to-end consumer: folded per-key counts across a mixed history equal a direct aggregate") {
    val s = spark
    import s.implicits._
    val l = leaf("consumer")
    var cursor = Cursor.initial
    var state = Map.empty[String, Long]
    def poll(): Unit = {
      val ch = changesSince(spark, l, cursor)
      val add =
        if (ch.appended.isEmpty) Map.empty[String, Long]
        else readAppended(spark, ch).groupBy("k").count().as[(String, Long)].collect().toMap
      val sub =
        if (ch.removed.isEmpty) Map.empty[String, Long]
        else readRemoved(spark, ch).groupBy("k").count().as[(String, Long)].collect().toMap
      state = (state.keySet ++ add.keySet ++ sub.keySet).map { k =>
        k -> (state.getOrElse(k, 0L) + add.getOrElse(k, 0L) - sub.getOrElse(k, 0L))
      }.filter(_._2 != 0L).toMap
      cursor = ch.next
    }

    append(l, 1, 250); poll()
    compactAll(l); poll()
    append(l, 251, 300); poll()
    compactAll(l)
    append(l, 301, 320); poll() // two ops in ONE window
    val direct = ManifestCommit.readLeaf(spark, l)
      .groupBy("k").count().as[(String, Long)].collect().toMap
    state shouldBe direct
  }

  test("merge-on-read deletes feed exactly in BOTH modes: the four-term fold equals a direct aggregate through delete, fold, and a checkpointed window") {
    val s = spark
    import s.implicits._
    val l = leaf("mor-consumer")
    var cursor = Cursor.initial
    var state = Map.empty[String, Long]
    var sawDiff = false
    var sawDeleted = false
    def poll(): Unit = {
      val ch = changesSince(spark, l, cursor)
      if (ch.mode == "diff") sawDiff = true
      if (ch.deleted.nonEmpty) sawDeleted = true
      def counts(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("k").count().as[(String, Long)].collect().toMap
      val plus = Seq(
        if (ch.appended.nonEmpty) counts(readAppended(spark, ch)) else Map.empty[String, Long],
        if (ch.restored.nonEmpty) counts(readRestored(spark, l, ch)) else Map.empty[String, Long],
      )
      val minus = Seq(
        if (ch.removed.nonEmpty) counts(readRemoved(spark, ch)) else Map.empty[String, Long],
        if (ch.deleted.nonEmpty) counts(readDeleted(spark, l, ch)) else Map.empty[String, Long],
      )
      val keys = (plus ++ minus).flatMap(_.keySet).toSet ++ state.keySet
      state = keys.map { k =>
        k -> (state.getOrElse(k, 0L) + plus.map(_.getOrElse(k, 0L)).sum - minus.map(_.getOrElse(k, 0L)).sum)
      }.filter(_._2 != 0L).toMap
      cursor = ch.next
    }
    def check(): Unit =
      state shouldBe ManifestCommit.readLeaf(spark, l)
        .groupBy("k").count().as[(String, Long)].collect().toMap

    append(l, 1, 200); poll(); check()
    // walk mode: a pure MoR delete — the sidecar's rows are the ⊖ side
    ManifestCommit.deleteWhereMoR(spark, l, col("id") % 10 === 0L, cfg).get.success shouldBe true
    poll(); check()
    sawDeleted shouldBe true
    // the physical fold nets to zero in the same feed
    compactAll(l); poll(); check()
    // diff mode: delete again, then checkpoint the log so the window
    // cannot walk — the sidecar surfaces through the live-set diff
    ManifestCommit.deleteWhereMoR(spark, l, col("id") % 7 === 0L, cfg).get.success shouldBe true
    ManifestCommit.checkpoint(spark, l, ManifestCommit.currentSeq(spark, l)) should be >= 2
    poll(); check()
    sawDiff shouldBe true
    // and one delete+fold pair inside a SINGLE walked window: the
    // consumed sidecar's rows are the window's only net change
    val before = state
    ManifestCommit.deleteWhereMoR(spark, l, col("id") % 11 === 0L, cfg).get.success shouldBe true
    compactAll(l); poll(); check()
    state should not be before
  }
}
