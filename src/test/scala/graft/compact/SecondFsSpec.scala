package graft.compact

import java.io.File
import java.net.URI
import java.nio.file.Files
import java.time.LocalDate

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** A second `FileSystem` scheme backed by [[RawLocalFileSystem]] — no
  * checksums, no caching quirks of the default `file:` LocalFileSystem.
  * Registered per-scheme via `fs.graftfs.impl`, exactly how `s3a` rides
  * in through `fs.s3a.impl`.
  *
  * RawLocalFileSystem's statuses load permissions LAZILY via
  * `new java.io.File(path.toUri)`, which rejects any scheme but `file` —
  * so every status is rewritten with its permission materialized up
  * front (object-store FileSystems return eager statuses the same way).
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  private def eager(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    "graft", "graft", st.getPath,
  )
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(eager)
}

/** The compactor's whole life in production is an object store reached
  * through a NON-default FileSystem (the reference hardcodes S3,
  * parquet_compactor.py:40-54); every graft code path resolves its
  * FileSystem from the path's scheme (FileIndexer.fsFor), so nothing may
  * silently assume `file:`. This spec runs the full
  * list → plan → merge → validate → commit cycle against a second
  * registered scheme.
  *
  * s3a commit caveat (ARCHITECTURE.md "Object-store commit"): `rename` on
  * s3a is copy+delete, non-atomic and O(bytes). The staged-write +
  * footer-validation design means a crash mid-commit duplicates rows but
  * never loses them — the reference's at-least-once bar — and the
  * Planner's `.staging-*` filter keeps debris out of future plans.
  */
class SecondFsSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val asOf = LocalDate.parse("2026-06-20")
  private val staleMs = java.sql.Timestamp.valueOf("2026-06-01 00:00:00").getTime
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    root = Files.createTempDirectory("graft-secondfs").toFile
    val s = spark
    import s.implicits._
    Seq("p1", "p2").foreach { src =>
      val leaf = new File(root, s"acct/source=$src/year=2026/month=01")
      leaf.mkdirs()
      Seq("a", "b", "c").foreach { n =>
        val tmp = new File(leaf, s".tmp-$n")
        (1 to 25).map(i => (i.toLong, s"$src-$n")).toDF("id", "tag")
          .coalesce(1).write.parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, new File(leaf, s"$n.parquet").toPath)
        tmp.listFiles().foreach(_.delete()); tmp.delete()
        new File(leaf, s"$n.parquet").setLastModified(staleMs)
      }
    }
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  test("full compaction cycle through a non-default FileSystem scheme") {
    val graftRoot = s"graftfs:${root.getAbsolutePath}"

    // the scheme resolves to our FS, not LocalFileSystem
    FileIndexer.fsFor(spark, graftRoot) shouldBe a[GraftTestFs]

    val bagBefore = spark.read.parquet(s"$graftRoot/acct/source=*/year=*/month=*")
      .collect().map(_.toString).sorted

    val cfg = CompactorConfig(targetFileBytes = 10L * 1024 * 1024, asOf = Some(asOf))
    val results = Compactor.run(spark, graftRoot, cfg)
    results.size shouldBe 2
    results.foreach(r => withClue(r) { r.success shouldBe true })
    // every result leaf kept the graftfs scheme end-to-end
    results.foreach(_.leaf should startWith("graftfs:"))

    Seq("p1", "p2").foreach { src =>
      val leaf = new File(root, s"acct/source=$src/year=2026/month=01")
      val names = leaf.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
      withClue(names) {
        names.size shouldBe 1
        names.head should fullyMatch regex s"${src}_[0-9a-f]{32}\\.parquet"
      }
    }
    val bagAfter = spark.read.parquet(s"$graftRoot/acct/source=*/year=*/month=*")
      .collect().map(_.toString).sorted
    bagAfter shouldBe bagBefore
  }
}
