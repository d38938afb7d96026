package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Per-leaf fault isolation (SURVEY.md §2.3.9): the reference catches
  * per-chunk Arrow errors, marks the leaf failed, keeps its originals,
  * and continues the crawl (parquet_compactor.py:162-180, :327-328).
  */
class FaultIsolationSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime
  private val cfg = CompactorConfig(
    targetFileBytes = 64 * 1024,
    asOf = Some(LocalDate.parse("2026-06-20")),
    maxConcurrentLeaves = 2,
  )

  private def writeFile(dir: File, name: String, tag: String): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(dir, s".tmp-${System.nanoTime()}")
    (1 to 10).map(i => (i.toLong, tag)).toDF("id", "tag")
      .coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(dir, name).toPath)
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
    new File(dir, name).setLastModified(staleMs)
  }

  test("a corrupt file fails its leaf, keeps originals, and other leaves still compact") {
    val root = Files.createTempDirectory("graft-fault").toFile
    val badLeaf = new File(root, "a/source=bad/year=2026/month=01")
    val goodLeaf = new File(root, "a/source=good/year=2026/month=01")
    Seq(badLeaf, goodLeaf).foreach(_.mkdirs())

    writeFile(badLeaf, "ok.parquet", "ok")
    val corrupt = new File(badLeaf, "corrupt.parquet")
    Files.write(corrupt.toPath, "not a parquet file".getBytes)
    corrupt.setLastModified(staleMs)
    writeFile(goodLeaf, "g1.parquet", "g1")
    writeFile(goodLeaf, "g2.parquet", "g2")

    val results = Compactor.run(spark, root.getAbsolutePath, cfg)

    val bad = results.find(_.leaf.contains("source=bad")).get
    bad.success shouldBe false
    bad.error should not be empty
    // originals untouched, no partial deletes
    badLeaf.listFiles().map(_.getName).toSet shouldBe Set("ok.parquet", "corrupt.parquet")

    val good = results.find(_.leaf.contains("source=good")).get
    good.success shouldBe true
    good.rowsWritten shouldBe 20L
    goodLeaf.listFiles().count(_.getName.matches("good_[0-9a-f]{32}\\.parquet")) shouldBe 1
  }
}
