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

  test("mortonCode clamps out-of-contract inputs: negatives floor to 0, over-wide wrap mod 2^bits") {
    val s = spark
    import s.implicits._
    val bits = 8
    val df = Seq(
      (-5L, 3L), // negative -> behaves as (0, 3)
      (0L, 3L),
      (300L, 7L), // 300 = 256 + 44 -> behaves as (44, 7)
      (44L, 7L),
    ).toDF("x", "y")
    val zs = df.select(ZOrder.mortonCode(bits, col("x"), col("y")).as("z")).as[Long].collect()
    zs(0) shouldBe zs(1)
    zs(2) shouldBe zs(3)
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
    // nearly every file bounding both keys within ~half the domain, at
    // most ~half the files qualify — vs ALL of them under an x-only
    // sort. NOT all 16: repartitionByRange boundaries come from seeded
    // sampling (seed depends on RDD id, so test order shifts it), and a
    // range that straddles one of the 3 high-bit z transitions
    // (16384/32768/49152) legitimately spans the full domain in one
    // dimension. At most 3 straddlers exist; demand the other 13 tight.
    spans.count { case (xs, _) => xs <= 127L } should be >= 13
    spans.count { case (_, ys) => ys <= 127L } should be >= 13
  }

  test("a two-sided filter over Z-laid-out files SKIPS most row groups at the scan") {
    // End-to-end skip proof, not just footer prunability: Spark's v1
    // parquet scan lists every file but hands the pushed predicate to
    // parquet-mr, which drops whole row groups on footer min/max before
    // decoding a page. With the vectorized reader (record-level filter
    // off by default) the scan's numOutputRows is exactly the rows of
    // the SURVIVING row groups — each output file here is one row
    // group, so rows-out measures files actually read.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-zskip").toString
    val n = 1L << 16
    val base = s.range(0, n)
      .select((col("id") % 256).as("x"), ((col("id") * 2654435761L) % 256).as("y"))
    graft.operators.ZOrder.layout(base, 16, 8, col("x"), col("y"))
      .write.parquet(s"$dir/z")
    val filtered = s.read.parquet(s"$dir/z")
      .where(col("x").between(32, 63) && col("y").between(64, 95))
    filtered.collect().length shouldBe base
      .where(col("x").between(32, 63) && col("y").between(64, 95)).count().toInt
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    // the predicate reached the reader…
    scan.metadata("PushedFilters") should (include("GreaterThanOrEqual(x,") and include("LessThanOrEqual(y,"))
    scan.metrics("numFiles").value shouldBe 16L // listing does NOT prune — the footer does
    // …and pruned ≥ half the files (the verdict bar). Ideal is 1 of 16
    // tiles for a 32x32 box in 64x64 tiles; range-boundary straddle can
    // leak a few more, so pin the contract, not the ideal.
    val rowsRead = scan.metrics("numOutputRows").value
    rowsRead should be <= n / 2
    rowsRead should be > 0L
  }

  test("rankBucketColumns: monotone in the key, in-contract range, invariant under monotone transforms") {
    val s = spark
    import s.implicits._
    val bits = 5
    // skewed, wide-range keys: exactly the shape raw interleave wraps
    // into noise (values up to ~10^12 >> 2^5)
    val keys = (0 until 2000).map(i => (i.toLong, (i.toLong * i * 271828) % 1000000007L))
    val df = keys.toDF("id", "k")
    val rank = ZOrder.rankBucketColumns(df, bits, Seq("k")).head
    val got = df.select(col("k"), rank.as("r")).as[(Long, Long)].collect().sortBy(_._1)
    // in contract: ranks inside [0, 2^bits)
    got.foreach { case (_, r) => r should (be >= 0L and be < (1L << bits)) }
    // monotone: sorted by key, ranks never decrease, and the buckets are
    // genuinely used (a wrap-style collapse would leave ~1 distinct)
    got.map(_._2).sliding(2).foreach { w => if (w.length == 2) w(0) should be <= w(1) }
    got.map(_._2).distinct.length should be >= (1 << bits) / 2
    // invariance: any strictly monotone transform of the key yields the
    // SAME ranks row for row (the quantile sketch is order-isomorphic) —
    // this is the property that makes layout robust for arbitrary ranges
    val dfT = keys.toDF("id", "k").select(col("id"), (col("k") * 37L + 11L).as("k"))
    val rankT = ZOrder.rankBucketColumns(dfT, bits, Seq("k")).head
    val gotT = dfT.select(col("id"), rankT.as("r")).as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    val byId = df.select(col("id"), rank.as("r")).as[(Long, Long)].collect().sortBy(_._1).map(_._2)
    gotT.toSeq shouldBe byId.toSeq
  }

  test("rankBucketColumns: constant and null-heavy columns degrade to rank 0, never fail") {
    val s = spark
    import s.implicits._
    val df = (0 until 100).map(i => (i.toLong, 42L)).toDF("id", "k")
    val rank = ZOrder.rankBucketColumns(df, 4, Seq("k")).head
    df.select(rank.as("r")).as[Long].collect().foreach(_ shouldBe 0L)
    val dfN = (0 until 100).map(i => (i.toLong, Option.empty[java.lang.Long])).toDF("id", "k")
    val rankN = ZOrder.rankBucketColumns(dfN, 4, Seq("k")).head
    // NULL ranks stay NULL here; mortonCode's greatest(·, 0) places them
    // at coordinate 0 downstream — same documented total-order policy
    dfN.select(ZOrder.mortonCode(4, rankN).as("z")).as[Long].collect().foreach(_ shouldBe 0L)
  }
}
