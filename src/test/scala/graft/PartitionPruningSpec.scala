package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Partition pruning (SURVEY.md §4 P1): the reference prunes volatile
  * partitions by string-matching S3 paths; with Hive-partitioned layout
  * Spark turns the same predicate into listing-level pruning — files of
  * non-matching partitions are never read, which is the property that
  * matters when `year=` spans a decade of a 100 TB lake.
  */
class PartitionPruningSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("a partition-column filter prunes at the listing, not the scan") {
    val dir = Files.createTempDirectory("graft-part").toFile.getAbsolutePath
    val orders = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val filtered = spark.read.parquet(dir).where(col("o_year") === 1995)

    // plan carries the predicate as a PartitionFilter
    val plan = filtered.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include regex """PartitionFilters: \[.*o_year.*1995.*\]"""

    // and only the matching partition's files are touched
    val files = filtered.select(input_file_name()).distinct().collect().map(_.getString(0))
    files should not be empty
    all(files) should include("o_year=1995")

    val expected = orders.where(col("o_year") === 1995).count()
    filtered.count() shouldBe expected
  }
}
