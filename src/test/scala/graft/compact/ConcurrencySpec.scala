package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Concurrent merge jobs on a shared SparkSession: 12 groups on an
  * 8-deep pool must all commit correctly — per-leaf staging dirs,
  * renames, and deletes cannot interfere across threads.
  */
class ConcurrencySpec extends AnyFunSuite with Matchers with SparkSpec {

  test("12 leaves compact concurrently without interference") {
    val s = spark
    import s.implicits._
    val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime
    val root = Files.createTempDirectory("graft-conc").toFile

    (0 until 12).foreach { i =>
      val leaf = new File(root, s"acct${i % 3}/source=s$i/year=2026/month=0${1 + i % 4}")
      leaf.mkdirs()
      (0 until 3).foreach { j =>
        val tmp = new File(leaf, s".tmp-$i-$j")
        (1 to 50).map(r => (r.toLong, s"leaf$i-f$j")).toDF("id", "tag")
          .coalesce(1).write.parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, new File(leaf, s"f$j.parquet").toPath)
        tmp.listFiles().foreach(_.delete())
        tmp.delete()
        new File(leaf, s"f$j.parquet").setLastModified(staleMs)
      }
    }

    val cfg = CompactorConfig(
      targetFileBytes = 64 * 1024,
      asOf = Some(LocalDate.parse("2026-06-20")),
      maxConcurrentLeaves = 8,
    )
    val results = Compactor.run(spark, root.getAbsolutePath, cfg)

    results.size shouldBe 12
    results.foreach(r => withClue(r) { r.success shouldBe true })
    results.map(_.rowsWritten).sum shouldBe 12L * 3 * 50

    // every leaf holds exactly one compacted file with all its rows
    (0 until 12).foreach { i =>
      val leaf = new File(root, s"acct${i % 3}/source=s$i/year=2026/month=0${1 + i % 4}")
      val names = leaf.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName)
      names.length shouldBe 1
      names.head should fullyMatch regex s"s${i}_[0-9a-f]{32}\\.parquet"
      val tags = spark.read.parquet(leaf.getAbsolutePath)
        .select("tag").distinct().as[String].collect().sorted
      tags shouldBe (0 until 3).map(j => s"leaf$i-f$j").sorted.toArray
    }
  }
}
