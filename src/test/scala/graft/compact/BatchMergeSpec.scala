package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.DataFrame
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The many-tiny-leaf swarm — the shape the reference spends its life on
  * (parquet_compactor.py:295-328 iterates thousands of leaves serially).
  * Pins that [[BatchMerger]] collapses job count while preserving every
  * [[CompactorSpec]] invariant, and that ineligible plans (heterogeneous
  * schema, oversized) still take the solo path correctly.
  */
class BatchMergeSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val asOf = LocalDate.parse("2026-06-20")
  private val staleMs = java.sql.Timestamp.valueOf("2026-06-01 00:00:00").getTime
  private val cfg = CompactorConfig(
    targetFileBytes = 10L * 1024 * 1024, // every fixture leaf is "tiny"
    asOf = Some(asOf),
    maxConcurrentLeaves = 2,
    // smaller than the leaf count, so the swarm test exercises the
    // toLocalIterator MULTI-SLICE path (several runBatch calls), not
    // just one big batch
    planBatchSize = 7,
  )
  private val hex32 = "[0-9a-f]{32}"

  private var root: File = _
  private val nLeaves = 40

  private def df(tag: String, n: Int = 20): DataFrame = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  private def writeFile(dir: File, name: String, data: DataFrame): Unit = {
    val tmp = new File(dir, s".tmp-${System.nanoTime()}")
    data.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(dir, name).toPath)
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
    new File(dir, name).setLastModified(staleMs)
    ()
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-batch").toFile
    (0 until nLeaves).foreach { i =>
      val leaf = new File(root, f"acct$i%03d/source=s$i%03d/year=2026/month=01")
      leaf.mkdirs()
      writeFile(leaf, "a.parquet", df(s"a$i"))
      writeFile(leaf, "b.parquet", df(s"b$i"))
    }
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  test("swarm of tiny leaves compacts in O(1) jobs, all invariants hold") {
    val bagBefore = spark.read.parquet(root.getAbsolutePath + "/acct*/source=*/year=*/month=*")
      .collect().map(_.toString).sorted

    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    val results =
      try Compactor.run(spark, root.getAbsolutePath, cfg)
      finally {
        Thread.sleep(1500) // let the async listener bus drain job-start events
        spark.sparkContext.removeSparkListener(listener)
      }

    results.size shouldBe nLeaves
    results.foreach(r => withClue(r) { r.success shouldBe true })
    // Solo merges cost >= 2 jobs per leaf (scan-infer + write); batched is
    // a handful for the whole swarm (listing, planning, one merged write).
    // Allow generous slack — the point is O(1), not an exact count.
    withClue(s"jobs=${jobs.get()}") { jobs.get() should be < nLeaves }

    // row preservation + naming + originals gone, per leaf
    (0 until nLeaves).foreach { i =>
      val leaf = new File(root, f"acct$i%03d/source=s$i%03d/year=2026/month=01")
      val names = leaf.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSeq
      withClue(s"leaf $i: $names") {
        names.size shouldBe 1
        names.head should fullyMatch regex f"s$i%03d_$hex32\\.parquet"
      }
    }
    val bagAfter = spark.read.parquet(root.getAbsolutePath + "/acct*/source=*/year=*/month=*")
      .collect().map(_.toString).sorted
    bagAfter shouldBe bagBefore
  }

  test("heterogeneous-schema leaf falls back to solo merge and still succeeds") {
    val s = spark
    import s.implicits._
    val hroot = Files.createTempDirectory("graft-batch-het").toFile
    try {
      // two homogeneous leaves + one whose files disagree on schema
      Seq("h1", "h2").foreach { n =>
        val leaf = new File(hroot, s"acct/source=$n/year=2026/month=01"); leaf.mkdirs()
        writeFile(leaf, "a.parquet", df(s"$n-a")); writeFile(leaf, "b.parquet", df(s"$n-b"))
      }
      val het = new File(hroot, "acct/source=het/year=2026/month=01"); het.mkdirs()
      writeFile(het, "a.parquet", df("het-a"))
      writeFile(het, "b.parquet", (1 to 5).map(i => (i.toLong, s"x$i", i * 1.5)).toDF("id", "tag", "score"))

      val results = Compactor.run(spark, hroot.getAbsolutePath, cfg)
      results.size shouldBe 3
      results.foreach(r => withClue(r) { r.success shouldBe true })
      // the heterogeneous leaf kept every column (solo path uses mergeSchema)
      val hetOut = spark.read.parquet(het.getAbsolutePath)
      hetOut.columns.toSet shouldBe Set("id", "tag", "score")
      hetOut.count() shouldBe 25
    } finally {
      def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
      rm(hroot)
    }
  }

  test("a zero-row group survives the batch path (no partitionBy dir is written for it)") {
    val zroot = Files.createTempDirectory("graft-batch-zero").toFile
    try {
      // two normal tiny leaves + one whose files are footer-only (0 rows)
      Seq("z1", "z2").foreach { n =>
        val leaf = new File(zroot, s"acct/source=$n/year=2026/month=01"); leaf.mkdirs()
        writeFile(leaf, "a.parquet", df(s"$n-a")); writeFile(leaf, "b.parquet", df(s"$n-b"))
      }
      val empty = new File(zroot, "acct/source=empty/year=2026/month=01"); empty.mkdirs()
      writeFile(empty, "a.parquet", df("e").where(org.apache.spark.sql.functions.lit(false)))
      writeFile(empty, "b.parquet", df("e").where(org.apache.spark.sql.functions.lit(false)))

      val results = Compactor.run(spark, zroot.getAbsolutePath, cfg)
      results.size shouldBe 3
      results.foreach(r => withClue(r) { r.success shouldBe true })
      val er = results.find(_.leaf.contains("source=empty")).get
      er.rowsWritten shouldBe 0L
      // the empty originals are gone — the group converged instead of
      // re-failing forever
      empty.listFiles().count(_.getName.endsWith(".parquet")) should be <= 1
    } finally {
      def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
      rm(zroot)
    }
  }

  test("oversized plans are routed solo even when tiny plans batch") {
    val s = spark
    import s.implicits._
    val mroot = Files.createTempDirectory("graft-batch-mixed").toFile
    try {
      Seq("t1", "t2").foreach { n =>
        val leaf = new File(mroot, s"acct/source=$n/year=2026/month=01"); leaf.mkdirs()
        writeFile(leaf, "a.parquet", df(s"$n-a")); writeFile(leaf, "b.parquet", df(s"$n-b"))
      }
      val bigLeaf = new File(mroot, "acct/source=big/year=2026/month=01"); bigLeaf.mkdirs()
      writeFile(bigLeaf, "a.parquet", df("big-a", 40000))
      writeFile(bigLeaf, "b.parquet", df("big-b", 40000))

      // threshold sized so the big leaf exceeds it but stays a candidate
      val mixed = cfg.copy(targetFileBytes = 200L * 1024)
      val results = Compactor.run(spark, mroot.getAbsolutePath, mixed)
      results.size shouldBe 3
      results.foreach(r => withClue(r) { r.success shouldBe true })
      spark.read.parquet(bigLeaf.getAbsolutePath).count() shouldBe 80000
    } finally {
      def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
      rm(mroot)
    }
  }
}
