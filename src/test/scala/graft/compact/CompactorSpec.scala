package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** End-to-end compaction on a local-filesystem replica of the reference's
  * S3 layout, pinning the semantic invariants of SURVEY.md §2.3.
  */
class CompactorSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val asOf = LocalDate.parse("2026-06-20")
  private val cfg = CompactorConfig(
    targetFileBytes = 64 * 1024,
    maxRowsPerFile = 1000000L,
    asOf = Some(asOf),
    maxConcurrentLeaves = 2,
  )
  private val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime
  private val freshMs = java.sql.Timestamp.valueOf("2026-06-18 00:00:00").getTime

  private var root: File = _
  private var stdLeaf: File = _
  private var volatileLeaf: File = _
  private var gcpLeaf: File = _

  private def df(tag: String, n: Int = 10): DataFrame = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  /** Write one parquet file at an exact path with an exact mtime. */
  private def writeFile(dir: File, name: String, data: DataFrame, mtimeMs: Long): File = {
    val tmp = new File(dir, s".tmp-${System.nanoTime()}")
    data.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(dir, name)
    Files.move(part.toPath, dest.toPath)
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
    dest.setLastModified(mtimeMs)
    dest
  }

  private def parquetNames(dir: File): Seq[String] =
    dir.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet")).map(_.getName).toSeq.sorted

  private def readBag(dir: File): Seq[(Long, String)] = {
    val s = spark
    import s.implicits._
    spark.read.parquet(dir.getAbsolutePath).as[(Long, String)].collect().toSeq.sorted
  }

  private val hex32 = "[0-9a-f]{32}"

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-compact").toFile
    stdLeaf = new File(root, "acct1/source=src1/year=2026/month=05")
    volatileLeaf = new File(root, "acct1/AWS/source=aws1/year=2026/month=06")
    gcpLeaf = new File(root, "acct2/GCP/source=g1/year=2026/month=01")
    Seq(stdLeaf, volatileLeaf, gcpLeaf).foreach(_.mkdirs())

    // standard leaf: 2 stale new + 1 fresh new + old & new compacted + 1 big
    writeFile(stdLeaf, "new_a.parquet", df("new_a"), staleMs)
    writeFile(stdLeaf, "new_b.parquet", df("new_b"), staleMs)
    writeFile(stdLeaf, "fresh.parquet", df("fresh"), freshMs)
    writeFile(stdLeaf, s"src1_${"0" * 32}.parquet", df("compacted_old"), staleMs - 86400000L)
    writeFile(stdLeaf, s"src1_${"1" * 32}.parquet", df("compacted_new"), staleMs)
    writeFile(stdLeaf, "big.parquet", df("big", 200000), staleMs) // > 64 KiB

    // volatile current-month AWS leaf: must not be touched at all
    writeFile(volatileLeaf, "v1.parquet", df("v1"), staleMs)
    writeFile(volatileLeaf, "v2.parquet", df("v2"), staleMs)

    // GCP leaf: two (invoice_month, date) groups of 2 files each
    writeFile(gcpLeaf, "202601_2026-01-01_x.parquet", df("d1x"), staleMs)
    writeFile(gcpLeaf, "202601_2026-01-01_y.parquet", df("d1y"), staleMs)
    writeFile(gcpLeaf, "202601_2026-01-02_x.parquet", df("d2x"), staleMs)
    writeFile(gcpLeaf, "202601_2026-01-02_y.parquet", df("d2y"), staleMs)
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    rm(root)
    super.afterAll()
  }

  private var results: Seq[LeafResult] = _
  private var stdBagBefore: Seq[(Long, String)] = _
  private var gcpBagBefore: Seq[(Long, String)] = _

  test("compaction run succeeds per group") {
    stdBagBefore = readBag(stdLeaf)
    gcpBagBefore = readBag(gcpLeaf)
    results = Compactor.run(spark, root.getAbsolutePath, cfg)
    results.foreach(r => withClue(r) { r.success shouldBe true })
    // std leaf: 1 group; gcp leaf: 2 groups; volatile: none
    results.map(r => (r.leaf.contains("GCP"), r.stem)).sorted shouldBe
      Seq((false, "src1"), (true, "202601_2026-01-01"), (true, "202601_2026-01-02")).sorted
  }

  test("invariant: row preservation — leaf bag is unchanged") {
    readBag(stdLeaf) shouldBe stdBagBefore
    readBag(gcpLeaf) shouldBe gcpBagBefore
  }

  test("invariant: output naming is {stem}_{32hex}.parquet and originals are deleted") {
    val names = parquetNames(stdLeaf)
    // fresh + big survive untouched; old compacted survives; the newest
    // compacted + 2 stale new files were replaced by one merged output
    names.count(_.matches(s"src1_$hex32\\.parquet")) shouldBe 2 // old compacted + new merged
    names should contain("fresh.parquet")
    names should contain("big.parquet")
    names should contain(s"src1_${"0" * 32}.parquet") // old compacted untouched
    names should not contain s"src1_${"1" * 32}.parquet" // newest was absorbed
    names should not contain "new_a.parquet"
    names should not contain "new_b.parquet"
  }

  test("invariant: freshness guard — file newer than 5 days is untouched") {
    val s = spark
    import s.implicits._
    val freshRows = spark.read.parquet(new File(stdLeaf, "fresh.parquet").getAbsolutePath).as[(Long, String)].collect()
    freshRows.map(_._2).distinct shouldBe Array("fresh")
  }

  test("invariant: volatile current-month AWS partition is untouched") {
    parquetNames(volatileLeaf) shouldBe Seq("v1.parquet", "v2.parquet")
  }

  test("invariant: GCP date isolation — one output file per (invoice, date)") {
    val s = spark
    import s.implicits._
    val names = parquetNames(gcpLeaf)
    names.count(_.matches(s"202601_2026-01-01_$hex32\\.parquet")) shouldBe 1
    names.count(_.matches(s"202601_2026-01-02_$hex32\\.parquet")) shouldBe 1
    names.size shouldBe 2
    val d1 = names.find(_.startsWith("202601_2026-01-01")).get
    spark.read.parquet(new File(gcpLeaf, d1).getAbsolutePath).as[(Long, String)]
      .collect().map(_._2).distinct.sorted shouldBe Array("d1x", "d1y")
  }

  test("invariant: idempotence — second run is a no-op") {
    val before = parquetNames(stdLeaf) ++ parquetNames(gcpLeaf) ++ parquetNames(volatileLeaf)
    val second = Compactor.run(spark, root.getAbsolutePath, cfg)
    second shouldBe empty
    val after = parquetNames(stdLeaf) ++ parquetNames(gcpLeaf) ++ parquetNames(volatileLeaf)
    after shouldBe before
  }

  test("invariant: tail growth — once stale, the fresh file merges into the newest compacted") {
    val later = cfg.copy(asOf = Some(asOf.plusDays(10)))
    val third = Compactor.run(spark, root.getAbsolutePath, later)
    val stdResults = third.filter(_.stem == "src1")
    stdResults.size shouldBe 1
    stdResults.head.success shouldBe true
    readBag(stdLeaf) shouldBe stdBagBefore // bag still preserved
    parquetNames(stdLeaf) should not contain "fresh.parquet"
  }

  test("row cap: maxRowsPerFile splits oversized merges") {
    val leaf = new File(root, "acct3/source=caps/year=2026/month=01")
    leaf.mkdirs()
    writeFile(leaf, "a.parquet", df("a", 30), staleMs)
    writeFile(leaf, "b.parquet", df("b", 30), staleMs)
    val capped = cfg.copy(maxRowsPerFile = 25L)
    val res = Compactor.run(spark, leaf.getAbsolutePath, capped)
    res.size shouldBe 1
    res.head.success shouldBe true
    res.head.rowsWritten shouldBe 60L
    parquetNames(leaf).size should be >= 3 // 60 rows / 25-row cap
    parquetNames(leaf).foreach(_ should fullyMatch regex s"caps_$hex32\\.parquet")
  }
}
