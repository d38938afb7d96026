package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The persisted inverted index must answer BM25 probes EXACTLY like
  * the one-shot query over the same corpus — after a build, after
  * appends (global stats move, so every score moves), and after
  * compaction — while reading only the probed term buckets.
  */
class IndexStoreSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "merge", "window")

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-idx").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def docs = graft.Tables.documents(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4))).toSeq

  /** One-shot reference over an arbitrary docs frame, via a temp view
    * (SearchQueries.bm25 reads a fixture dir; the store must match it
    * on ANY corpus slice, so the reference recomputes inline).
    */
  private def oneShot(d: org.apache.spark.sql.DataFrame) = {
    val tf = d.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("dl"),
        terms.zipWithIndex.map { case (t, i) =>
          count(when(col("word") === t, 1)).as(s"tf${i + 1}")
        }: _*)
    val gCols = Seq(
      count(lit(1)).cast("double").as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
    ) ++ (1 to 3).map(i => count(when(col(s"tf$i") > 0, 1)).cast("double").as(s"df$i"))
    val g = tf.agg(gCols.head, gCols.tail: _*)
    val score = (1 to 3).map(i =>
      expr(graft.queries.SearchQueries.contribSql(s"tf$i", s"df$i"))).reduce(_ + _)
    tf.crossJoin(broadcast(g))
      .where((1 to 3).map(i => col(s"tf$i")).reduce(_ + _) > 0)
      .select(
        (col("doc_id") +: (1 to 3).map(i => col(s"tf$i").cast("int").as(s"tf$i")) :+
          round(score, 6).as("bm25")): _*)
      .orderBy(desc("bm25"), col("doc_id"))
  }

  test("a built index answers probes exactly like the one-shot BM25") {
    val path = new File(root, "full").getAbsolutePath
    IndexStore.build(spark, docs, path)
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(docs))
    an[IllegalArgumentException] should be thrownBy IndexStore.build(spark, docs, path)
  }

  test("append re-scores the WHOLE corpus: stats move, old docs' scores move with them") {
    val path = new File(root, "inc").getAbsolutePath
    val half1 = docs.where(col("doc_id") % 2 === 0)
    val half2 = docs.where(col("doc_id") % 2 === 1)
    IndexStore.build(spark, half1, path)
    val before = rows(IndexStore.search(spark, path, terms))
    before shouldBe rows(oneShot(half1))

    IndexStore.append(spark, half2, path)
    val after = rows(IndexStore.search(spark, path, terms))
    after shouldBe rows(oneShot(docs))
    // the append moved n/avgdl/df — a first-half doc's score must have
    // CHANGED (probe-time scoring, not stored scores)
    val beforeScores = before.map(r => r._1 -> r._5).toMap
    after.exists(r => beforeScores.get(r._1).exists(_ != r._5)) shouldBe true
  }

  test("compact folds the generations into one; probes identical") {
    val path = new File(root, "cmp").getAbsolutePath
    val thirds = (0 until 3).map(k => docs.where(col("doc_id") % 3 === k))
    IndexStore.build(spark, thirds(0), path)
    IndexStore.append(spark, thirds(1), path)
    IndexStore.append(spark, thirds(2), path)
    val before = rows(IndexStore.search(spark, path, terms))
    IndexStore.compact(spark, path)
    val names = new File(path).listFiles().map(_.getName)
    names.count(_.startsWith("add-")) shouldBe 1
    names.count(_.startsWith("_current-")) shouldBe 1
    rows(IndexStore.search(spark, path, terms)) shouldBe before
    before shouldBe rows(oneShot(docs))
  }

  test("probes read only the query terms' buckets: deleting every non-probed partition changes nothing") {
    val path = new File(root, "prune").getAbsolutePath
    IndexStore.build(spark, docs, path)
    val before = rows(IndexStore.search(spark, path, terms))
    val probed = terms.map(IndexStore.bucketOf).toSet
    val addDir = new File(path, "add-1")
    addDir.listFiles().filter(_.getName.startsWith("tb=")).foreach { d =>
      val b = d.getName.stripPrefix("tb=").toLong
      if (!probed.contains(b)) {
        def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
        rm(d)
      }
    }
    // non-probed postings are gone from disk; the probe never notices
    rows(IndexStore.search(spark, path, terms)) shouldBe before
  }

  test("tombstoned docs vanish from probes — n/avgdl/df move, survivors re-score") {
    val path = new File(root, "del").getAbsolutePath
    IndexStore.build(spark, docs, path)
    val gone = docs.where(col("doc_id") % 10 === 0)
    IndexStore.applyDelta(spark, path, added = None, removed = Some(gone))
    val survivors = docs.where(col("doc_id") % 10 =!= 0)
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(survivors))

    // compact drops the tombstoned rows PHYSICALLY and clears del dirs
    IndexStore.compact(spark, path)
    val names = new File(path).listFiles().map(_.getName)
    names.count(_.startsWith("add-")) shouldBe 1
    names.count(_.startsWith("del-")) shouldBe 0
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(survivors))
  }

  test("a doc re-added after removal scores from its NEW edition only (the update shape)") {
    val s = spark
    import s.implicits._
    val path = new File(root, "readd").getAbsolutePath
    val v1 = Seq((1L, "spark merge window alpha"), (2L, "beta gamma delta spark")).toDF("doc_id", "text")
    IndexStore.build(spark, v1, path)
    // update doc 1: remove the old edition, add the new one
    IndexStore.applyDelta(spark, path, added = None, removed = Some(v1.where($"doc_id" === 1L)))
    val v2row = Seq((1L, "window window merge epsilon zeta")).toDF("doc_id", "text")
    IndexStore.applyDelta(spark, path, added = Some(v2row), removed = None)
    val updated = v1.where($"doc_id" =!= 1L).unionByName(v2row)
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(updated))
    // and the fold keeps exactly the live editions
    IndexStore.compact(spark, path)
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(updated))
  }

  test("syncFromLeaf follows a manifest leaf: arrivals, a ZERO-work compaction walk, a retention delete") {
    import graft.compact.{CommitMode, CompactorConfig, LeafPlan, ManifestCommit, Merger, WapCommit}
    val leaf = new File(root, "cdc-leaf").getAbsolutePath
    val path = new File(root, "cdc-idx").getAbsolutePath
    val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)
    val gate = Seq(WapCommit.AuditCheck.notNull("doc_id"))
    val d = docs.select(col("doc_id"), col("text"))

    WapCommit.writeAuditPublish(spark, leaf, d.where(col("doc_id") % 2 === 0), gate, cfg)
    IndexStore.syncFromLeaf(spark, leaf, path) should (be("walk") or be("diff")) // bootstrap
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(d.where(col("doc_id") % 2 === 0)))

    WapCommit.writeAuditPublish(spark, leaf, d.where(col("doc_id") % 2 === 1), gate, cfg)
    IndexStore.syncFromLeaf(spark, leaf, path) shouldBe "walk"
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(d))

    // replay idempotence: nothing new on the leaf → noop, seq unchanged
    val seqBefore = IndexStore.currentSeq(spark, path).get
    IndexStore.syncFromLeaf(spark, leaf, path) shouldBe "noop"
    IndexStore.currentSeq(spark, path).get shouldBe seqBefore

    // pure compaction of the leaf: the walk verifies net-zero, so the
    // sync advances the cursor with ZERO data read on either side —
    // proven by corrupting every live leaf byte before the sync
    val live = ManifestCommit.liveFiles(spark, leaf)
    val bytes = live.map(f => new File(f).length).sum
    Merger.mergeAndCommit(spark, LeafPlan(leaf, "fold", live, bytes), cfg).success shouldBe true
    val merged = ManifestCommit.liveFiles(spark, leaf)
    val saved = merged.map(p => p -> Files.readAllBytes(new File(p).toPath)).toMap
    merged.foreach(p => Files.write(new File(p).toPath, "not parquet".getBytes))
    IndexStore.syncFromLeaf(spark, leaf, path) shouldBe "walk"
    saved.foreach { case (p, b) => Files.write(new File(p).toPath, b) }
    rows(IndexStore.search(spark, path, terms)) shouldBe rows(oneShot(d))

    // retention delete → retraction feed → tombstones; scores shift
    ManifestCommit.deleteWhere(spark, leaf, col("doc_id") % 10 === 0, cfg).get.success shouldBe true
    IndexStore.syncFromLeaf(spark, leaf, path) shouldBe "walk"
    rows(IndexStore.search(spark, path, terms)) shouldBe
      rows(oneShot(d.where(col("doc_id") % 10 =!= 0)))
  }
}
