package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("mortonCode matches a bit-by-bit reference on exhaustive 6-bit pairs") {
    val s = spark
    import s.implicits._
    def ref(bits: Int, xs: Seq[Long]): Long =
      (for { (x, c) <- xs.zipWithIndex; j <- 0 until bits }
        yield ((x >> j) & 1L) << (j * xs.size + c)).sum
    val pairs = for { x <- 0L until 64L; y <- 0L until 64L } yield (x, y)
    val got = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.mortonCode(6, col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => z shouldBe ref(6, Seq(x, y)) }
  }

  test("mortonCode interleaves three columns at the documented positions") {
    val s = spark
    import s.implicits._
    // x=1 (bit0→pos0), y=1 (bit0→pos1), w=1 (bit0→pos2) → 0b111 = 7
    val z = Seq((1L, 1L, 1L)).toDF("x", "y", "w")
      .select(ZOrder.mortonCode(4, col("x"), col("y"), col("w")).as("z"))
      .as[Long].head()
    z shouldBe 7L
  }

  test("layout bounds EVERY dimension per partition where a linear sort bounds only its own") {
    val s = spark
    import s.implicits._
    // uniform 256x256 key space; 16 output partitions. A linear x-sort
    // and the Z-curve tile the same AREA per partition (16x256 vs
    // 64x64) — the Z win is that BOTH dimensions stay bounded, so a
    // file-stats reader prunes on either key, not just the sort key.
    val base = s.range(0, 1 << 16)
      .select((col("id") % 256).as("x"), ((col("id") * 2654435761L) % 256).as("y"))
    def avgYSpan(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("y") - min("y") + 1).as("y_span"))
        .agg(avg("y_span")).as[Double].head()
    val zSpan = avgYSpan(ZOrder.layout(base, 16, 8, col("x"), col("y")))
    val linSpan = avgYSpan(base.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // linear: every partition sees the full y range (~256). Z: ideal
    // partitions are 64x64 tiles; range-split boundaries may straddle
    // tiles, so require <=128, not the ideal 64.
    linSpan should be > 200.0
    zSpan should be <= 128.0
  }

  test("mortonCode matches the reference on randomized column counts, widths, and values (seeded)") {
    val s = spark
    import s.implicits._
    def ref(bits: Int, xs: Seq[Long]): Long =
      (for { (x, c) <- xs.zipWithIndex; j <- 0 until bits }
        yield ((x >> j) & 1L) << (j * xs.size + c)).sum
    val rnd = new scala.util.Random(20260813L)
    (1 to 10).foreach { _ =>
      val k = 2 + rnd.nextInt(3) // 2..4 columns
      val bits = 4 + rnd.nextInt(9) // 4..12 bits, k*bits <= 48
      val rows = Seq.fill(200)(Seq.fill(k)(rnd.nextLong(1L << bits)))
      val df = rows.map(r => (r, 0)).toDF("xs", "pad")
      val cols = (0 until k).map(i => col("xs").getItem(i))
      val got = df.select(ZOrder.mortonCode(bits, cols: _*).as("z")).as[Long].collect()
      got.zip(rows).foreach { case (z, r) => z shouldBe ref(bits, r) }
    }
  }

  test("written Z-order files carry prunable min/max footer stats on BOTH keys") {
    // The end-to-end property the layout exists for: after
    // ZOrder.layout + write.parquet, EVERY file's parquet footer bounds
    // both interleaved columns tightly, so a reader filtering on either
    // key skips most files on stats alone — no data pages touched.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val base = s.range(0, 1 << 16)
      .select((col("id") % 256).as("x"), ((col("id") * 2654435761L) % 256).as("y"))
    graft.operators.ZOrder.layout(base, 16, 8, col("x"), col("y"))
      .write.parquet(s"$dir/z")
    val conf = s.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(s"$dir/z").getFileSystem(conf)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/z"))
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    files.length shouldBe 16
    val spans = files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val cols = reader.getFooter.getBlocks.asScala.flatMap(_.getColumns.asScala)
        def span(name: String): Long = {
          val cs = cols.filter(_.getPath.toDotString == name).map(_.getStatistics)
          cs.map(_.genericGetMax.asInstanceOf[Long]).max - cs.map(_.genericGetMin.asInstanceOf[Long]).min
        }
        (span("x"), span("y"))
      } finally reader.close()
    }
    // a y=k point query reads files whose [min,max] covers it: with
    // every file bounding y within ~half the domain, at most ~half the
    // files qualify — vs ALL of them under an x-only sort
    spans.foreach { case (xs, ys) =>
      xs should be <= 127L
      ys should be <= 127L
    }
  }
}
