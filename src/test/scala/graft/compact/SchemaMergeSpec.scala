package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Schema unification semantics (SURVEY.md §1.2): the reference's
  * pyarrow read unifies compatible schemas implicitly and surfaces
  * incompatible ones as a caught, per-leaf ArrowException. Spark-side:
  * mergeSchema=true unifies; an unreconcilable type conflict fails that
  * leaf only, originals kept.
  */
class SchemaMergeSpec extends AnyFunSuite with Matchers with SparkSpec {

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

  test("compatible schema evolution merges to the union schema") {
    val s = spark
    import s.implicits._
    val leaf = new File(Files.createTempDirectory("graft-schema").toFile, "a/source=ev/year=2026/month=01")
    leaf.mkdirs()
    writeOne(leaf, "old.parquet", Seq((1L, "x")).toDF("id", "tag"))
    writeOne(leaf, "new.parquet", Seq((2L, "y", 9.5)).toDF("id", "tag", "score"))

    val res = Compactor.run(spark, leaf.getParentFile.getParentFile.getParentFile.getParentFile.getAbsolutePath, cfg)
    res.map(_.success) shouldBe Seq(true)

    val merged = spark.read.parquet(leaf.getAbsolutePath)
    merged.columns.sorted shouldBe Array("id", "score", "tag")
    merged.count() shouldBe 2
    merged.where(col("id") === 1).select("score").collect().head.isNullAt(0) shouldBe true
  }

  test("incompatible types fail the leaf and keep originals") {
    val s = spark
    import s.implicits._
    val leaf = new File(Files.createTempDirectory("graft-schema2").toFile, "a/source=bad/year=2026/month=01")
    leaf.mkdirs()
    writeOne(leaf, "ints.parquet", Seq((1L, 5L)).toDF("id", "v"))
    writeOne(leaf, "strs.parquet", Seq((2L, "five")).toDF("id", "v"))

    val res = Compactor.run(spark, leaf.getParentFile.getParentFile.getParentFile.getParentFile.getAbsolutePath, cfg)
    res.map(_.success) shouldBe Seq(false)
    leaf.listFiles().map(_.getName).toSet shouldBe Set("ints.parquet", "strs.parquet")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
