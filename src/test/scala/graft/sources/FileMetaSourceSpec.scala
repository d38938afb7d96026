package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.compact.FileIndexer

class FileMetaSourceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("DSv2 listing matches an independent filesystem walk") {
    // FileIndexer.list delegates to this source, so the oracle must be
    // independent: a plain java.nio walk of the same tree.
    val viaSource = spark.read
      .format("graft.sources.FileMetaSource")
      .load(dir)
      .select("path", "size", "mtimeMs")
      .collect()
      .map(r => (r.getString(0).stripPrefix("file:"), r.getLong(1)))
      .toSet
    val viaWalk = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .iterator().asScala
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .map(p => (p.toString, java.nio.file.Files.size(p)))
        .toSet
    }
    viaSource shouldBe viaWalk
    viaSource should not be empty
    // and the delegating FileIndexer agrees (API-level smoke)
    FileIndexer.list(spark, dir).count() shouldBe viaWalk.size.toLong
  }

  test("metadata queries compose relationally over the source") {
    val agg = spark.read
      .format("graft.sources.FileMetaSource")
      .load(dir)
      .where(col("path").endsWith(".parquet"))
      .agg(count(lit(1)).as("n"), sum("size").as("bytes"))
      .collect()
      .head
    agg.getLong(0) shouldBe 10L // the 10 fixture tables
    agg.getLong(1) should be > 0L
  }
}
