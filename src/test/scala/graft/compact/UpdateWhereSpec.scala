package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** `ManifestCommit.updateWhere` — UPDATE ... SET ... WHERE as one
  * manifest commit: only hit files rewritten, SQL NULL semantics,
  * row-preserving by validation, schema fixed by the type cast, `mut`
  * declared so the walk never nets the count-equal rewrite to zero.
  */
class UpdateWhereSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-updwhere").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def writeFile(leaf: File, name: String, rows: Seq[(Long, Long)], tag: String): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    rows.map { case (i, v) => (i, v, tag) }.toDF("id", "v", "tag")
      .coalesce(1).write.parquet(tmp.getAbsolutePath)
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
          fs, leafPath, s"arr$i", s"urun$i",
          inputsRel = Seq.empty, outputsRel = Seq(new org.apache.hadoop.fs.Path(f).getName),
          rows = spark.read.parquet(f).count(),
        )
      }
  }

  private def bag(leaf: String): Seq[(Long, Long, String)] =
    ManifestCommit.readLeaf(spark, leaf).select("id", "v", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq

  test("only cond=TRUE rows change, only hit files rewrite, rows and schema are preserved, the update references other columns") {
    val leaf = new File(root, "basic"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 100L).map(i => (i, i * 10L)), "a")
    writeFile(leaf, "b.parquet", (101L to 200L).map(i => (i, i * 10L)), "b")
    commitAll(leafPath)
    val liveBefore = ManifestCommit.liveFiles(spark, leafPath).toSet
    val before = bag(leafPath)

    // hits ONLY a.parquet; the assignment reads another column
    val r = ManifestCommit.updateWhere(
      spark, leafPath, col("id") <= 50L, Map("v" -> (col("v") + col("id"))), cfg).get
    withClue(r) { r.success shouldBe true }
    r.rowsWritten shouldBe 100L // all of a's rows staged (updated and not)
    val liveAfter = ManifestCommit.liveFiles(spark, leafPath).toSet
    (liveBefore -- liveAfter).map(p => new File(p).getName) shouldBe Set("a.parquet")
    liveAfter.map(p => new File(p).getName) should contain("b.parquet")
    bag(leafPath) shouldBe before.map { case (i, v, t) => if (i <= 50L) (i, v + i, t) else (i, v, t) }
    // schema fixed: v stayed a LONG through the arithmetic
    ManifestCommit.readLeaf(spark, leafPath).schema("v").dataType.typeName shouldBe "long"

    // SQL NULL semantics: a NULL-evaluating cond row is NOT updated
    val s = spark
    import s.implicits._
    val leafN = new File(root, "nulls"); leafN.mkdirs()
    val tmp = new File(leafN, ".tmp-n")
    Seq((Some(1L), 10L, "x"), (None: Option[Long], 20L, "x"), (Some(3L), 30L, "x"))
      .toDF("id", "v", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
    Files.move(
      tmp.listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      new File(leafN, "n.parquet").toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    commitAll(leafN.getAbsolutePath)
    ManifestCommit.updateWhere(
      spark, leafN.getAbsolutePath, col("id") > 0L, Map("v" -> lit(0L)), cfg).get.success shouldBe true
    ManifestCommit.readLeaf(spark, leafN.getAbsolutePath)
      .select("v").collect().map(_.getLong(0)).sorted shouldBe Array(0L, 0L, 20L) // NULL id row kept v=20

    // unknown assignment column refused loudly
    intercept[IllegalArgumentException] {
      ManifestCommit.updateWhere(spark, leafPath, col("id") === 1L, Map("nope" -> lit(1)), cfg)
    }
  }

  test("the walk replays an update as retract+assert (mut flag) and an IndexStore-style consumer sees the new editions; MoR sidecars fold through") {
    val leaf = new File(root, "feed"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 40L).map(i => (i, i)), "a")
    commitAll(leafPath)

    // outstanding MoR delete, then the update: the retracted row must
    // neither update nor resurrect
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") === 7L, cfg).get.success shouldBe true
    val c0 = ChangeFeed.Cursor.atHead(spark, leafPath)
    val r = ManifestCommit.updateWhere(
      spark, leafPath, col("id") % 2 === 1L, Map("v" -> (col("v") * 100L)), cfg).get
    withClue(r) { r.success shouldBe true }
    r.rowsWritten shouldBe 39L // delete-aware: the retracted row is gone from the rewrite
    bag(leafPath).find(_._1 == 7L) shouldBe None
    bag(leafPath).find(_._1 == 9L).get._2 shouldBe 900L
    bag(leafPath).find(_._1 == 8L).get._2 shouldBe 8L
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty // folded (consumed whole, no residual)

    // the window is count-preserving data-wise but must NOT net to zero
    val ch = ChangeFeed.changesSince(spark, leafPath, c0)
    ch.mode shouldBe "walk"
    ch.isEmpty shouldBe false
    val plus = ChangeFeed.readAppended(spark, ch).select("id", "v").collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq ++
      (if (ch.restored.isEmpty) Seq.empty[(Long, Long)]
       else ChangeFeed.readRestored(spark, leafPath, ch).select("id", "v").collect()
         .map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq)
    val minus = ChangeFeed.readRemoved(spark, ch).select("id", "v").collect()
      .map(r2 => (r2.getLong(0), r2.getLong(1))).toSeq
    // MULTISET consumer fold: (pre-state ⊎ plus) ∖ minus == post-state
    // (an un-updated row rides +1 appended −1 removed over its +1 pre)
    val preAware = (1L to 40L).filterNot(_ == 7L).map(i => (i, i))
    val post = bag(leafPath).map(t => (t._1, t._2)).sorted
    (preAware ++ plus).diff(minus).sorted shouldBe post
  }

  test("assignments targeting the _mor_rel/_mor_pos identity columns are refused, and the error lists only data columns") {
    val leaf = new File(root, "internals"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    writeFile(leaf, "a.parquet", (1L to 10L).map(i => (i, i)), "a")
    commitAll(leafPath)
    // before the fix these passed the require (the identity columns ride
    // the classification scan) and were then silently dropped from the
    // staged schema — an UPDATE that "succeeds" and changes nothing
    Seq("_mor_rel", "_mor_pos", "nope").foreach { bad =>
      val ex = intercept[IllegalArgumentException] {
        ManifestCommit.updateWhere(spark, leafPath, col("id") === 1L, Map(bad -> lit("x")), cfg)
      }
      ex.getMessage should include(s"unknown column '$bad'")
      // the advertised leaf-column list must not leak the internals
      val listed = ex.getMessage.substring(ex.getMessage.indexOf("leaf columns:"))
      listed should not include "_mor"
    }
    // untouched: the refused commits left no manifest behind
    bag(leafPath).map(_._2) shouldBe (1L to 10L)
  }
}
