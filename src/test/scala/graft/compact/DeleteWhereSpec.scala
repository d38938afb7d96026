package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `ManifestCommit.deleteWhere` — the retention / right-to-be-forgotten
  * commit: one sealed manifest removes exactly the cond=TRUE rows,
  * rewrites ONLY the files that contain them, and is the public
  * producer of genuine retractions for ChangeFeed consumers.
  */
class DeleteWhereSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-delwhere").toFile
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
    ids.map(i => (i, tag)).toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, name).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ()
  }

  private def commitAll(leafPath: String): Unit = {
    val fs = FileIndexer.fsFor(spark, leafPath)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(leafPath))
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq
    // publish each raw arrival as its own append commit so deleteWhere
    // operates on manifest-tracked files with distinct identities
    files.sorted.zipWithIndex.foreach { case (f, i) =>
      ManifestCommit.publish(
        FileIndexer.fsFor(spark, leafPath), leafPath, s"arr$i", s"run$i",
        inputsRel = Seq.empty, outputsRel = Seq(new org.apache.hadoop.fs.Path(f).getName),
        rows = spark.read.parquet(f).count(),
      )
    }
  }

  private def bag(leaf: String): Seq[(Long, String)] =
    ManifestCommit.readLeaf(spark, leaf).select("id", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq

  test("deleteWhere removes exactly the matching rows, rewrites only the hit files, empties leave no output") {
    val leaf = new File(root, "basic"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 100L, "a") // partially hit
    writeFile(leaf, "b.parquet", 101L to 200L, "b") // untouched by the range delete
    writeFile(leaf, "c.parquet", Seq(300L, 303L, 306L), "c") // fully inside the deleted range
    commitAll(leafPath)
    val before = bag(leafPath)
    val liveBefore = ManifestCommit.liveFiles(spark, leafPath).toSet

    // delete ids in [300, 400): hits ONLY c.parquet (fully) — a and b untouched
    val r1 = ManifestCommit.deleteWhere(spark, leafPath, col("id") >= 300L && col("id") < 400L, cfg)
    r1.get.success shouldBe true
    r1.get.filesWritten shouldBe 0 // fully-emptied input → no replacement output
    val liveAfter1 = ManifestCommit.liveFiles(spark, leafPath).toSet
    (liveBefore -- liveAfter1).map(p => new File(p).getName) shouldBe Set("c.parquet")
    (liveAfter1 -- liveBefore) shouldBe Set.empty // no rewrite of untouched files
    bag(leafPath) shouldBe before.filterNot { case (id, _) => id >= 300L && id < 400L }

    // delete id % 10 == 0: hits a and b, partial rewrites
    val before2 = bag(leafPath)
    val r2 = ManifestCommit.deleteWhere(spark, leafPath, col("id") % 10 === 0L, cfg)
    r2.get.success shouldBe true
    bag(leafPath) shouldBe before2.filterNot { case (id, _) => id % 10 == 0L }

    // no-match: no commit, the head does not move
    val head = ManifestCommit.currentSeq(spark, leafPath)
    ManifestCommit.deleteWhere(spark, leafPath, col("id") > 999999L, cfg) shouldBe None
    ManifestCommit.currentSeq(spark, leafPath) shouldBe head
  }

  test("SQL DELETE null semantics: a NULL-evaluating row survives") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "nulls"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val tmp = new File(leaf, ".tmp-n")
    Seq((1L, Some("x")), (2L, None: Option[String]), (3L, Some("y")))
      .toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    Files.move(
      tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      new File(leaf, "n.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ManifestCommit.publish(
      FileIndexer.fsFor(spark, leafPath), leafPath, "arr", "run0",
      inputsRel = Seq.empty, outputsRel = Seq("n.parquet"), rows = 3L)

    // cond is NULL for id=2 (tag is null): only id=1 goes
    ManifestCommit.deleteWhere(spark, leafPath, col("tag") === "x", cfg).get.success shouldBe true
    ManifestCommit.readLeaf(spark, leafPath).select("id").collect().map(_.getLong(0)).sorted shouldBe
      Array(2L, 3L)
  }

  test("the classification pass prunes through the stats sidecars: non-intersecting files are never opened") {
    val statsCfg = cfg.copy(statsColumns = Seq("id"))
    val leaf = new File(root, "pruned"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    // three disjoint-range files committed WITH sidecars (mergeAndCommit
    // seals the per-file id intervals)
    Seq(("a", 1L to 100L), ("b", 101L to 200L), ("c", 201L to 300L)).foreach { case (t, ids) =>
      writeFile(leaf, s"$t.parquet", ids, t)
      val f = s"$leafPath/$t.parquet"
      ManifestCommit.mergeAndCommit(
        spark, LeafPlan(leafPath, s"in$t", Seq(f), new File(f).length()), statsCfg,
      ).success shouldBe true
    }
    // corrupt every live file OUTSIDE [120, 180]: an unpruned
    // classification read would throw; the sidecar prune never opens them
    val live = ManifestCommit.liveFiles(spark, leafPath)
    val spared = live.filter { p =>
      val ids = spark.read.parquet(p).select("id").collect().map(_.getLong(0))
      ids.exists(i => i >= 120L && i <= 180L)
    }
    val saved = live.filterNot(spared.contains).map(p => p -> Files.readAllBytes(new File(p).toPath)).toMap
    saved.keys.foreach(p => Files.write(new File(p).toPath, "not parquet".getBytes))

    val r = ManifestCommit.deleteWhere(spark, leafPath, col("id") >= 120L && col("id") <= 180L, statsCfg)
    r.get.success shouldBe true
    saved.foreach { case (p, b) => Files.write(new File(p).toPath, b) }
    ManifestCommit.readLeaf(spark, leafPath).select("id").collect().map(_.getLong(0)).sorted shouldBe
      ((1L to 119L) ++ (181L to 300L)).toArray
  }

  test("the retraction feed sees the delete: removed inputs, appended survivors") {
    val leaf = new File(root, "feed"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", 1L to 50L, "a")
    commitAll(leafPath)
    val cursor = ChangeFeed.Cursor.atHead(spark, leafPath)

    ManifestCommit.deleteWhere(spark, leafPath, col("id") <= 10L, cfg).get.success shouldBe true
    val ch = ChangeFeed.changesSince(spark, leafPath, cursor)
    ch.mode shouldBe "walk" // a row-changing rewrite classifies as ⊕outputs ⊖inputs
    ChangeFeed.readRemoved(spark, ch).select("id").collect().map(_.getLong(0)).sorted shouldBe
      (1L to 50L).toArray
    ChangeFeed.readAppended(spark, ch).select("id").collect().map(_.getLong(0)).sorted shouldBe
      (11L to 50L).toArray
  }
}
