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

  test("orc round-trip preserves rows and pushes filters to the orc scan") {
    val dir = Files.createTempDirectory("graft-orc").toFile.getAbsolutePath
    val src = sample
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    back.orderBy("o_orderkey").collect() shouldBe src.collect()
    // columnar format: predicate pushdown reaches the scan like parquet
    val plan = back.where(col("o_totalprice") > 100000).queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("o_totalprice")
  }

  test("binaryFile source feeds the multimodal pipeline: raw files -> features") {
    // The ingest path real media takes: opaque files on disk read by the
    // built-in binaryFile DSv2 source (path/length/content columns), then
    // the batched codec boundary. No custom IO code to maintain.
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("graft-bin").toFile
    (1 to 5).foreach { i =>
      Files.write(new java.io.File(dir, f"media_$i%02d.png").toPath, multimodal.Multimodal.syntheticPng(i.toLong, 8, 8))
    }
    val files = s.read.format("binaryFile").load(dir.getAbsolutePath)
    files.columns.toSet should contain allOf ("path", "length", "content")
    val media = files
      .orderBy("path")
      .select(
        (row_number().over(org.apache.spark.sql.expressions.Window.orderBy("path")).cast("long")).as("doc_id"),
        lit("image").as("media_type"),
        col("content").as("payload"),
      )
      .as[multimodal.Multimodal.MediaRow]
    val feats = multimodal.Multimodal.extractFeatures(media, multimodal.Multimodal.JdkCodec).collect()
    feats.length shouldBe 5
    all(feats.map(_.n_bytes)) should be > 0
    all(feats.map(_.width)) shouldBe 8
    feats.map(_.doc_id).sorted shouldBe (1L to 5L).toArray
  }
}
