package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.operators.ZOrder

/** Z-order layout wired into the merge path (`CompactorConfig.layoutKeys`
  * — the OPTIMIZE … ZORDER BY step). Pins the three properties that make
  * layout-on-compact worth its shuffle:
  *
  *   1. output files cover DISJOINT Morton ranges (range partitioning on
  *      the Z-code), so footer min/max prune on every layout column;
  *   2. row content is a bag-identical merge — layout never touches
  *      validation or commit semantics, under either commit mode;
  *   3. rows inside a single output file are Z-sorted (row-group-level
  *      pruning), which also witnesses that layout runs route through the
  *      solo merge path, not BatchMerger's partitionBy write.
  */
class ZOrderCompactionSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val bits = 5
  private def z = ZOrder.mortonCode(bits, col("a"), col("b"))

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-zorder-compact").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    rm(root)
    super.afterAll()
  }

  /** n rows with (a, b) walking a 32x32 grid in a scattered order, so
    * arrival order correlates with NEITHER key (the layout has to earn
    * the clustering).
    */
  private def grid(tag: String, n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (0 until n)
      .map { i =>
        val cell = (i * 2654435761L) % 1024 // bijective scatter over the grid
        (i.toLong, cell / 32, cell % 32, tag)
      }
      .toDF("id", "a", "b", "tag")
  }

  private def writeInputs(leaf: File, nFiles: Int, rowsPerFile: Int): Seq[File] = {
    leaf.mkdirs()
    (0 until nFiles).map { k =>
      val tmp = new File(leaf, s".tmp-$k")
      grid(s"f$k", rowsPerFile).coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new File(leaf, s"new_$k.parquet")
      Files.move(part.toPath, dest.toPath)
      tmp.listFiles().foreach(_.delete())
      tmp.delete()
      dest
    }
  }

  private def planFor(leaf: File, files: Seq[File]) =
    LeafPlan(leaf.getAbsolutePath, "zsrc", files.map(_.getAbsolutePath), files.map(_.length()).sum)

  private def zRange(path: String): (Long, Long) = {
    val r = spark.read.parquet(path).select(min(z), max(z)).head()
    (r.getLong(0), r.getLong(1))
  }

  private def layoutCfg = CompactorConfig(
    maxRowsPerFile = 1000L,
    layoutKeys = Seq("a", "b"),
    layoutBits = bits,
  )

  test("rename commit: outputs cover disjoint Z-ranges and footer stats prune a 2-D box") {
    val leaf = new File(root, "acct1/source=zr/year=2026/month=05")
    val files = writeInputs(leaf, 4, 1000)
    val inputBag = spark.read.parquet(leaf.getAbsolutePath)
      .select("id", "a", "b", "tag").collect().map(_.toSeq).sortBy(_.toString)

    val res = Merger.mergeAndCommit(spark, planFor(leaf, files), layoutCfg)
    res.error shouldBe None
    res.success shouldBe true
    res.filesWritten should be >= 4

    val outs = leaf.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
    outs.length shouldBe res.filesWritten
    val outBag = spark.read.parquet(leaf.getAbsolutePath)
      .select("id", "a", "b", "tag").collect().map(_.toSeq).sortBy(_.toString)
    outBag shouldBe inputBag

    // 1) disjoint Z-ranges across files (range partitioning on the code)
    val ranges = outs.map(f => zRange(f.getAbsolutePath)).sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) => hi should be <= lo2 }

    // 2) per-file min/max on the ORIGINAL columns prune a quadrant box:
    // files that cannot contain a<8 AND b<8 are skippable by footer
    // stats alone — demand a majority skip, which arrival order (every
    // input file spans the whole grid) could never give.
    val skippable = outs.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath).select(min(col("a")), min(col("b"))).head()
      r.getLong(0) > 7 || r.getLong(1) > 7
    }
    skippable should be >= (outs.length / 2)
  }

  test("manifest commit: layout holds through the no-rename path") {
    val leaf = new File(root, "acct1/source=zm/year=2026/month=05")
    val files = writeInputs(leaf, 4, 1000)
    val inputRows = 4000L

    val res = Merger.mergeAndCommit(spark, planFor(leaf, files), layoutCfg.copy(commitMode = CommitMode.Manifest))
    res.error shouldBe None
    res.success shouldBe true

    val live = ManifestCommit.liveFiles(spark, leaf.getAbsolutePath)
    live.size shouldBe res.filesWritten
    ManifestCommit.readLeaf(spark, leaf.getAbsolutePath).count() shouldBe inputRows
    val ranges = live.map(zRange).sortBy(_._1)
    ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) => hi should be <= lo2 }
  }

  test("a leaf missing a layout key merges in arrival order instead of failing") {
    val leaf = new File(root, "acct1/source=zf/year=2026/month=05")
    val files = writeInputs(leaf, 3, 500)
    val res = Merger.mergeAndCommit(spark, planFor(leaf, files), layoutCfg.copy(layoutKeys = Seq("a", "no_such_col")))
    res.error shouldBe None
    res.success shouldBe true
    spark.read.parquet(leaf.getAbsolutePath).count() shouldBe 1500L
  }

  test("tiny leaves under layout skip the batch path: single output file is Z-sorted within") {
    val leaf = new File(root, "acct1/source=zt/year=2026/month=05")
    val files = writeInputs(leaf, 2, 400)
    // runBatch with >= 2 tiny plans would take BatchMerger when layout is
    // off; with layoutKeys set it must solo-merge (in-file Z-sort is the
    // observable the batch write does not produce).
    val leaf2 = new File(root, "acct1/source=zt2/year=2026/month=05")
    val files2 = writeInputs(leaf2, 2, 400)
    val results = Compactor.runBatch(
      spark,
      Seq(planFor(leaf, files), planFor(leaf2, files2)),
      layoutCfg.copy(maxRowsPerFile = 100000L),
    )
    results.foreach { r =>
      r.error shouldBe None
      r.success shouldBe true
      r.filesWritten shouldBe 1
    }
    Seq(leaf, leaf2).foreach { l =>
      val out = l.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
      out should have length 1
      val zs = spark.read.parquet(out.head.getAbsolutePath).select(z.as("z")).collect().map(_.getLong(0))
      zs.zip(zs.tail).foreach { case (x, y) => x should be <= y }
    }
  }
}
