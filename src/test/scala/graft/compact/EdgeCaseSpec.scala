package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Odd-but-legal layouts the planner/merger must survive. */
class EdgeCaseSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime
  private val cfg = CompactorConfig(
    targetFileBytes = 64 * 1024,
    asOf = Some(LocalDate.parse("2026-06-20")),
  )

  private def writeOne(dir: File, name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = new File(dir, s".tmp-${System.nanoTime()}")
    df.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(dir, name).toPath)
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
    new File(dir, name).setLastModified(staleMs)
    ()
  }

  test("zero-row parquet files compact without losing the (empty) bag") {
    val s = spark
    import s.implicits._
    val leaf = new File(Files.createTempDirectory("graft-empty").toFile, "a/source=z/year=2026/month=01")
    leaf.mkdirs()
    writeOne(leaf, "e1.parquet", Seq.empty[(Long, String)].toDF("id", "tag"))
    writeOne(leaf, "e2.parquet", Seq.empty[(Long, String)].toDF("id", "tag"))
    writeOne(leaf, "d1.parquet", Seq((1L, "x")).toDF("id", "tag"))

    val res = Compactor.run(spark, leaf.getParentFile.getParentFile.getParentFile.getParentFile.getAbsolutePath, cfg)
    res.map(_.success) shouldBe Seq(true)
    res.head.rowsWritten shouldBe 1L
    spark.read.parquet(leaf.getAbsolutePath).count() shouldBe 1L
    leaf.listFiles().count(_.getName.endsWith(".parquet")) should be >= 1
  }

  test("a leaf that is nothing but markers and fresh files plans no work") {
    val s = spark
    import s.implicits._
    val leaf = new File(Files.createTempDirectory("graft-markers").toFile, "a/source=m/year=2026/month=01")
    leaf.mkdirs()
    Files.write(new File(leaf, "_SUCCESS").toPath, Array.empty[Byte])
    writeOne(leaf, "fresh.parquet", Seq((1L, "f")).toDF("id", "tag"))
    new File(leaf, "fresh.parquet").setLastModified(System.currentTimeMillis())

    val res = Compactor.run(spark, leaf.getParentFile.getParentFile.getParentFile.getParentFile.getAbsolutePath, cfg)
    res shouldBe empty
    leaf.listFiles().map(_.getName).toSet shouldBe Set("_SUCCESS", "fresh.parquet")
  }
}
