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

  /** Bounding-box area of (a, b) over a slice of rows — the clustering
    * metric footer pruning actually cares about. Layout now interleaves
    * QUANTILE RANKS (boundaries sampled per merge), so assertions pin
    * box tightness rather than raw Morton codes the spec can't
    * reconstruct boundary-exactly.
    */
  private def boxArea(rows: Seq[(Long, Long)]): Long = {
    val as = rows.map(_._1); val bs = rows.map(_._2)
    (as.max - as.min + 1L) * (bs.max - bs.min + 1L)
  }

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

  private def fileBox(path: String): Long = {
    val rows = spark.read.parquet(path).select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    boxArea(rows)
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

    // 1) every output file covers a TIGHT 2-D box (range partitioning on
    // the rank-Z code): arrival order (each input spans the whole grid)
    // would give every file the full 1024-cell area. A file straddling a
    // Z-range boundary can elongate, so pin each file below 3/4 of the
    // grid and the average below half.
    val areas = outs.map(f => fileBox(f.getAbsolutePath))
    areas.foreach(_ should be <= 768L)
    (areas.sum / areas.length) should be <= 512L

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
    val areas = live.map(fileBox)
    areas.foreach(_ should be <= 768L)
    (areas.sum / areas.length) should be <= 512L
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
      // in-file Z-sortedness, observed through clustering: consecutive
      // quarters of the file each cover a small (a, b) box (a Z-sorted
      // walk stays inside one region at a time); arrival order would put
      // the full 1024-cell grid in every quarter
      val rows = spark.read.parquet(out.head.getAbsolutePath)
        .select(col("a"), col("b")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val qAreas = rows.grouped(math.max(1, rows.size / 4)).map(boxArea).toSeq
      qAreas.foreach(_ should be <= 768L)
      (qAreas.sum / qAreas.length) should be <= 512L
    }
  }

  test("keys spanning far beyond 2^bits prune exactly like narrow keys (quantile-rank bucketing)") {
    // The same scattered grid pushed through a strictly monotone affine
    // blow-up: values span ~3*10^8 >> 2^5. Raw interleave would wrap
    // these mod 32 into noise; quantile ranks are invariant under any
    // monotone transform, so layout must cluster and prune exactly as
    // the narrow-key tests do.
    val leaf = new File(root, "acct1/source=zw/year=2026/month=05")
    leaf.mkdirs()
    val s = spark
    import s.implicits._
    val files = (0 until 4).map { k =>
      val tmp = new File(leaf, s".tmp-$k")
      grid(s"f$k", 1000)
        .select(
          col("id"),
          (col("a") * 9999991L + 12345L).as("a"),
          (col("b") * 8888881L + 7L).as("b"),
          col("tag"),
        )
        .coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      val dest = new File(leaf, s"new_$k.parquet")
      Files.move(part.toPath, dest.toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      dest
    }
    val res = Merger.mergeAndCommit(spark, planFor(leaf, files), layoutCfg)
    res.error shouldBe None
    res.success shouldBe true
    res.filesWritten should be >= 4

    val outs = leaf.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
    // same box-tightness as the narrow grid, measured in grid CELLS
    // (divide the affine scale back out)
    outs.foreach { f =>
      val rows = spark.read.parquet(f.getAbsolutePath)
        .select(
          ((col("a") - 12345L) / 9999991L).cast("long").as("a"),
          ((col("b") - 7L) / 8888881L).cast("long").as("b"),
        )
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      boxArea(rows) should be <= 768L
    }
    // footer stats on the WIDE columns prune the scaled quadrant box
    val aCut = 8L * 9999991L + 12345L
    val bCut = 8L * 8888881L + 7L
    val skippable = outs.count { f =>
      val r = spark.read.parquet(f.getAbsolutePath).select(min(col("a")), min(col("b"))).head()
      r.getLong(0) >= aCut || r.getLong(1) >= bCut
    }
    skippable should be >= (outs.length / 2)
  }
}
