package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.compact.FileIndexer

class FileMetaSourceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("DSv2 listing matches FileIndexer") {
    val viaSource = spark.read
      .format("graft.sources.FileMetaSource")
      .load(dir)
      .select("path", "size", "mtimeMs")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSet
    val viaIndexer = FileIndexer.list(spark, dir)
      .collect()
      .map(f => (f.path, f.size))
      .toSet
    viaSource shouldBe viaIndexer
    viaSource should not be empty
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
