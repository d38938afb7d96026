package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Bucketed output layout: compaction with `bucketKey` must (1) keep the
  * merge's row bag exactly, (2) commit files whose names carry the
  * bucket tag the bucketed read resolves, (3) classify as compacted on
  * the next planning pass, and — the point of the feature — (4) let two
  * compacted leaves registered via [[BucketedLeaf.register]] sort-merge
  * join with ZERO shuffle exchanges.
  */
class BucketedCompactionSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val asOf = LocalDate.parse("2026-06-20")
  private val cfg = CompactorConfig(
    targetFileBytes = 64L * 1024 * 1024,
    asOf = Some(asOf),
    maxConcurrentLeaves = 2,
    bucketKey = Some("k"),
    bucketCount = 4,
  )
  private val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime

  private var root: File = _
  private var leafA: File = _
  private var leafB: File = _

  private def df(lo: Long, hi: Long, tag: String): DataFrame = {
    val s = spark
    import s.implicits._
    (lo until hi).map(i => (i, s"$tag$i")).toDF("k", "payload")
  }

  private def writeFile(dir: File, name: String, data: DataFrame): Unit = {
    val tmp = new File(dir, s".tmp-${System.nanoTime()}")
    data.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(dir, name)
    Files.move(part.toPath, dest.toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    dest.setLastModified(staleMs)
    ()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-bucketed-compact").toFile
    leafA = new File(root, "acct1/source=facta/year=2026/month=05")
    leafB = new File(root, "acct1/source=factb/year=2026/month=05")
    Seq(leafA, leafB).foreach(_.mkdirs())
    // two small stale files per leaf, overlapping key ranges
    writeFile(leafA, "a1.parquet", df(0L, 500L, "a"))
    writeFile(leafA, "a2.parquet", df(500L, 1000L, "a"))
    writeFile(leafB, "b1.parquet", df(0L, 700L, "b"))
    writeFile(leafB, "b2.parquet", df(700L, 1000L, "b"))
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    Seq("graft_spec_ta", "graft_spec_tb").foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
    super.afterAll()
  }

  test("bucketed compaction: bag identity, tagged names, compacted classification, zero-Exchange join") {
    val bagBefore = spark.read.parquet(leafA.getAbsolutePath)
      .collect().map(_.toString).sorted.toSeq

    val results = Compactor.run(spark, root.getAbsolutePath, cfg)
    withClue(results)(results.forall(_.success) shouldBe true)
    results.size shouldBe 2

    // bag identity per leaf
    spark.read.parquet(leafA.getAbsolutePath).collect().map(_.toString).sorted.toSeq shouldBe bagBefore

    // committed names carry the bucket tag: {stem}_{32hex}_{NNNNN}.parquet
    val namesA = leafA.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
    namesA should not be empty
    namesA.foreach(n => withClue(n)(n should fullyMatch regex "facta_[0-9a-f]{32}_\\d{5}\\.parquet"))
    // at most one file per bucket (repartition onto the bucket hash)
    namesA.size should be <= 4

    // the next planning pass classifies them as compacted: no plan forms
    // (a single compacted file per group never meets the >=2 gate alone)
    val files2 = FileIndexer.list(spark, root.getAbsolutePath)
    Planner.plan(spark, files2, cfg) shouldBe empty

    // zero-Exchange co-bucketed join through the registered tables
    BucketedLeaf.register(spark, "graft_spec_ta", leafA.getAbsolutePath, "k", 4)
    BucketedLeaf.register(spark, "graft_spec_tb", leafB.getAbsolutePath, "k", 4)
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeThresh = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("graft_spec_ta")
        .join(spark.table("graft_spec_tb"), "k")
      j.count() shouldBe 1000L
      val plan = j.queryExecution.executedPlan.toString
      plan should include("SortMergeJoin")
      (plan should not).include("Exchange hashpartitioning")
      // row parity with the plain (shuffling) parquet join
      val plain = spark.read.parquet(leafA.getAbsolutePath)
        .join(spark.read.parquet(leafB.getAbsolutePath).withColumnRenamed("payload", "p2"), "k")
      j.select(col("k")).collect().map(_.getLong(0)).sorted shouldBe
        plain.select(col("k")).collect().map(_.getLong(0)).sorted
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      prevAqeThresh match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
    }
  }
}
