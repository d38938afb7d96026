package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Non-parquet connectors (SURVEY.md §2.2 "other formats"): CSV and JSON
  * round-trips with explicit schemas — same DataFrame surface, so every
  * operator in the inventory runs unchanged over them.
  */
class SourcesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def sample = Tables.orders(spark, sf)
    .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    .orderBy("o_orderkey")
    .limit(200)

  test("csv round-trip preserves rows") {
    val dir = Files.createTempDirectory("graft-csv").toFile.getAbsolutePath
    val src = sample
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .option("header", "true")
      .schema(src.schema)
      .csv(dir)
    back.orderBy("o_orderkey").collect() shouldBe src.collect()
  }

  test("json round-trip preserves rows and an aggregate runs over the json source") {
    val dir = Files.createTempDirectory("graft-json").toFile.getAbsolutePath
    val src = sample
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    back.orderBy("o_orderkey").collect() shouldBe src.collect()
    back.groupBy("o_orderstatus").agg(count(lit(1))).count() should be > 0L
  }
}
