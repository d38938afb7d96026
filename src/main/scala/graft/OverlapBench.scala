package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Prices the grid-cell streaming overlap join (ROADMAP 47 /
  * [[EventStream.overlapJoinStream]]) against the DEGENERATE form it
  * replaces: the same watermarked stream-stream join with a CONSTANT
  * equality key, where every retained row of either side lives in one
  * state-store key group and each arriving row probes ALL of it — the
  * exact cost shape of an overlap join with no equality key. The grid
  * form keys state by time cell, so an arriving interval probes only
  * the rows sharing its ≤ 2 cells.
  *
  * Both queries consume identical interval batches whose start times
  * creep forward slowly (all batches stay inside the watermark, so
  * state ACCUMULATES — the regime that separates the two forms).
  * Emits one JSON line:
  * `{"metric":"overlap_stream_ms","batches":B,"rowsPerBatch":N,
  *   "grid":[ms…],"flat":[ms…],"gridTotal":..,"flatTotal":..,
  *   "gridPairs":..,"flatPairs":..}` — per-batch wall times,
  * matching pair counts as the cross-check.
  */
object OverlapBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_OVERLAP_BATCHES", "6").toInt
    val rowsPer = sys.env.getOrElse("SPARK_GRAFT_OVERLAP_ROWS", "1500").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-overlap-bench").toFile
    def dir(n: String) = { val f = new java.io.File(root, n); f.mkdirs(); f.getAbsolutePath }
    val (aGrid, bGrid, aFlat, bFlat) = (dir("a-grid"), dir("b-grid"), dir("a-flat"), dir("b-flat"))
    val (ckG, ckF) = (dir("ck-grid"), dir("ck-flat"))

    val baseMs = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    // batch k: rows spread over a shared 6-hour span with SECONDS-long
    // intervals, so matches are rare and the measured cost is the STATE
    // PROBE — the grid form compares an arriving row against its ≤ 2
    // cells' residents, the flat form against ALL retained state; cells
    // 30 min, watermark 12 h → state only accumulates
    def mkBatch(side: Int, k: Int): DataFrame = {
      val rows = (0 until rowsPer).map { i =>
        val id = (k.toLong * rowsPer + i) * 2 + side
        val s = baseMs + (i.toLong * 21600000L / rowsPer) + k * 1300L + side * 700L
        val e = s + 5000L + (id % 6) * 1000L // 5–10 s
        (id, new Timestamp(s), new Timestamp(e))
      }
      val p = if (side == 0) "a" else "b"
      rows.toDF(s"${p}_id", s"${p}_s", s"${p}_e")
    }
    def writeBatch(d: String, df: DataFrame): Unit =
      df.coalesce(1).write.mode("append").parquet(d)

    val schemaA = "a_id LONG, a_s TIMESTAMP, a_e TIMESTAMP"
    val schemaB = "b_id LONG, b_s TIMESTAMP, b_e TIMESTAMP"
    def readS(d: String, sch: String) =
      spark.readStream.schema(sch).option("maxFilesPerTrigger", 1000).parquet(d)

    // grid form: the library operator
    val gridQ = EventStream
      .overlapJoinStream(readS(aGrid, schemaA), readS(bGrid, schemaB),
        cellSeconds = 1800L, maxIntervalSeconds = 1800L, lateness = "12 hours")
      .writeStream.format("memory").queryName("grid_out")
      .outputMode("append").option("checkpointLocation", ckG).start()

    // mixed-length ladder: mostly seconds-long intervals plus a few
    // HOURS-long ones. The single grid must size its cell to the longest
    // interval (4 h), so every short interval shares a cell with ~1/cell
    // of the corpus — the multi-level form registers short intervals on
    // fine cells and only the long tail on coarse ones (O(levels) per
    // interval for any length mix).
    val (aC, bC, aL, bL) = (dir("a-coarse"), dir("b-coarse"), dir("a-levels"), dir("b-levels"))
    val (ckC, ckL) = (dir("ck-coarse"), dir("ck-levels"))
    def mkMixed(side: Int, k: Int): DataFrame = {
      val rows = (0 until rowsPer).map { i =>
        val id = (k.toLong * rowsPer + i) * 2 + side
        val s = baseMs + (i.toLong * 21600000L / rowsPer) + k * 1300L + side * 700L
        val len =
          if (i % 100 == 0) 3600000L + (id % 4) * 3600000L // 1–4 h tail
          else 5000L + (id % 6) * 1000L // 5–10 s bulk
        (id, new Timestamp(s), new Timestamp(s + len))
      }
      val p = if (side == 0) "a" else "b"
      rows.toDF(s"${p}_id", s"${p}_s", s"${p}_e")
    }
    val coarseQ = EventStream
      .overlapJoinStream(readS(aC, schemaA), readS(bC, schemaB),
        cellSeconds = 14400L, maxIntervalSeconds = 14400L, lateness = "12 hours")
      .writeStream.format("memory").queryName("coarse_out")
      .outputMode("append").option("checkpointLocation", ckC).start()
    val levelsQ = EventStream
      .overlapJoinStreamLevels(readS(aL, schemaA), readS(bL, schemaB),
        baseCellSeconds = 60L, levels = 9, maxIntervalSeconds = 14400L, lateness = "12 hours")
      .writeStream.format("memory").queryName("levels_out")
      .outputMode("append").option("checkpointLocation", ckL).start()

    // flat form: identical semantics, constant join key — one state group
    val aF = readS(aFlat, schemaA).withColumn("k", lit(0)).withWatermark("a_s", "12 hours")
    val bF = readS(bFlat, schemaB).withColumn("k", lit(0)).withWatermark("b_s", "12 hours")
    val flatQ = aF.join(
      bF,
      aF("k") === bF("k") &&
        col("a_s") < col("b_e") && col("b_s") < col("a_e") &&
        col("a_s") >= col("b_s") - expr("INTERVAL 1800 SECONDS") &&
        col("a_s") <= col("b_s") + expr("INTERVAL 1800 SECONDS"),
    )
      .select(col("a_id"), col("b_id"))
      .writeStream.format("memory").queryName("flat_out")
      .outputMode("append").option("checkpointLocation", ckF).start()

    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }
    val gridMs = Array.ofDim[Double](nBatches)
    val flatMs = Array.ofDim[Double](nBatches)
    val coarseMs = Array.ofDim[Double](nBatches)
    val levelsMs = Array.ofDim[Double](nBatches)
    (0 until nBatches).foreach { k =>
      val (ba, bb) = (mkBatch(0, k), mkBatch(1, k))
      writeBatch(aGrid, ba); writeBatch(bGrid, bb)
      gridMs(k) = timeMs(gridQ.processAllAvailable())
      writeBatch(aFlat, ba); writeBatch(bFlat, bb)
      flatMs(k) = timeMs(flatQ.processAllAvailable())
      val (ma, mb) = (mkMixed(0, k), mkMixed(1, k))
      writeBatch(aC, ma); writeBatch(bC, mb)
      coarseMs(k) = timeMs(coarseQ.processAllAvailable())
      writeBatch(aL, ma); writeBatch(bL, mb)
      levelsMs(k) = timeMs(levelsQ.processAllAvailable())
    }
    gridQ.stop(); flatQ.stop(); coarseQ.stop(); levelsQ.stop()

    val gridPairs = spark.sql("SELECT count(*) FROM grid_out").head().getLong(0)
    val flatPairs = spark.sql("SELECT count(*) FROM flat_out").head().getLong(0)
    require(gridPairs == flatPairs, s"pair counts diverged: grid=$gridPairs flat=$flatPairs")
    val coarsePairs = spark.sql("SELECT count(*) FROM coarse_out").head().getLong(0)
    val levelsPairs = spark.sql("SELECT count(*) FROM levels_out").head().getLong(0)
    require(coarsePairs == levelsPairs, s"mixed pair counts diverged: coarse=$coarsePairs levels=$levelsPairs")

    def arr(xs: Array[Double]) = xs.map(x => f"$x%.0f").mkString("[", ",", "]")
    println(
      s"""{"metric":"overlap_stream_ms","batches":$nBatches,"rowsPerBatch":$rowsPer,""" +
        s""""grid":${arr(gridMs)},"flat":${arr(flatMs)},""" +
        f""""gridTotal":${gridMs.sum}%.0f,"flatTotal":${flatMs.sum}%.0f,""" +
        s""""gridPairs":$gridPairs,"flatPairs":$flatPairs,""" +
        s""""mixed_coarse":${arr(coarseMs)},"mixed_levels":${arr(levelsMs)},""" +
        f""""coarseTotal":${coarseMs.sum}%.0f,"levelsTotal":${levelsMs.sum}%.0f,""" +
        s""""mixedPairs":$coarsePairs}""",
    )
    Fs.rmTree(root)
    spark.stop()
  }
}
