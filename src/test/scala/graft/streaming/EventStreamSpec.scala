package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class EventStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  // batches append new part-files into one flat dir the stream watches
  private def writeBatch(dir: String, name: String, rows: Seq[EventStream.Event]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF().coalesce(1).write.mode("append").parquet(dir)
  }

  private def mkDirs() = {
    val in = Files.createTempDirectory("stream-in").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("stream-chk").toFile.getAbsolutePath
    (in, in, chk)
  }

  test("hourlyStats aggregates event-time windows over a file stream") {
    val (glob, in, chk) = mkDirs()
    writeBatch(in, "b1", Seq(
      EventStream.Event(1, ts("2024-01-01 10:05:00"), 7, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:55:00"), 7, "click", 2.0),
      EventStream.Event(3, ts("2024-01-01 11:05:00"), 8, "view", 4.0),
    ))
    val q = EventStream
      .hourlyStats(EventStream.readEvents(spark, glob))
      .writeStream
      .format("memory")
      .queryName("hourly")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // watermark (2h) hasn't passed the open windows yet -> nothing emitted
    // in append mode until later data advances it
    writeBatch(in, "b2", Seq(EventStream.Event(4, ts("2024-01-01 14:30:00"), 8, "view", 8.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT bucket, event_type, n_events, total_value FROM hourly ORDER BY bucket")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
    out should contain("2024-01-01 10:00:00.0", "click", 2L, 3.0)
    out should contain("2024-01-01 11:00:00.0", "view", 1L, 4.0)
  }

  test("streaming dedup: dropDuplicatesWithinWatermark removes replayed events") {
    val (glob, in, chk) = mkDirs()
    writeBatch(in, "b1", Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // exact replay
      EventStream.Event(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0),
    ))
    val q = EventStream.readEvents(spark, glob)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream
      .format("memory")
      .queryName("dedup_stream")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // a replay arriving in a later batch, still inside the watermark
    writeBatch(in, "b2", Seq(EventStream.Event(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.sql("SELECT event_id FROM dedup_stream").collect().map(_.getLong(0)).sorted
    ids shouldBe Array(1L, 2L)
  }

  test("sessionize: a late in-watermark event joins its original session, not a later one") {
    val (glob, in, chk) = mkDirs()
    // two events 40 min apart = two prospective sessions (gap 30)
    writeBatch(in, "b1", Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 5, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:40:00"), 5, "click", 2.0),
    ))
    val q = EventStream
      .sessionize(spark, EventStream.readEvents(spark, glob), gapMinutes = 30, lateness = "2 hours")
      .writeStream
      .format("memory")
      .queryName("late_sessions")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // late event at 10:20 (inside the 2h watermark) BRIDGES the two
    // sessions into one — emitting the first session eagerly at the
    // batch-1 gap would have made this impossible
    writeBatch(in, "b2", Seq(EventStream.Event(3, ts("2024-01-01 10:20:00"), 5, "click", 4.0)))
    q.processAllAvailable()
    // advance the watermark far enough to close everything
    writeBatch(in, "b3", Seq(EventStream.Event(9, ts("2024-01-01 14:00:00"), 6, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT session_start, session_end, n_events, total_value FROM late_sessions WHERE user_id = 5")
      .collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
    out.toSeq shouldBe Seq(("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 3L, 7.0))
  }

  test("sessionWindows: built-in session_window merges and closes like sessionize") {
    val (glob, in, chk) = mkDirs()
    writeBatch(in, "b1", Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0), // same session (gap 30)
      EventStream.Event(3, ts("2024-01-01 11:30:00"), 1, "view", 4.0),  // new session
    ))
    val q = EventStream
      .sessionWindows(EventStream.readEvents(spark, glob), gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("builtin_sessions")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // advance the watermark to close both sessions
    writeBatch(in, "b2", Seq(EventStream.Event(9, ts("2024-01-01 15:00:00"), 2, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql(
      "SELECT session_start, session_end, n_events, total_value FROM builtin_sessions WHERE user_id = 1",
    ).collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    // session_window's end is last-event + gap (the built-in's convention;
    // sessionize reports last-event time instead)
    out.toSeq shouldBe Seq(
      ("2024-01-01 10:00:00.0", "2024-01-01 10:40:00.0", 2L, 3.0),
      ("2024-01-01 11:30:00.0", "2024-01-01 12:00:00.0", 1L, 4.0),
    )
  }

  test("stream-stream interval join: views attributed to clicks within 10 minutes") {
    val s = spark
    import s.implicits._
    val (glob, in, chk) = mkDirs()
    writeBatch(in, "b1", Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 0.0),
      EventStream.Event(2, ts("2024-01-01 10:04:00"), 1, "view", 0.0), // within window
      EventStream.Event(3, ts("2024-01-01 10:20:00"), 1, "view", 0.0), // outside window
      EventStream.Event(4, ts("2024-01-01 10:05:00"), 2, "view", 0.0), // other user, no click
    ))
    val events = EventStream.readEvents(spark, glob)
    val clicks = events.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    val views = events.where($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id".as("v_user"), $"ts".as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val q = views
      .join(
        clicks,
        expr("v_user = c_user AND v_ts >= c_ts AND v_ts <= c_ts + INTERVAL 10 MINUTES"),
      )
      .select("click_id", "view_id")
      .writeStream
      .format("memory")
      .queryName("attributed")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    q.stop()
    val pairs = spark.sql("SELECT click_id, view_id FROM attributed").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    pairs shouldBe Set((1L, 2L))
  }

  test("overlapJoinStream: grid-cell stream-stream overlap join with no equality key") {
    val s = spark
    import s.implicits._
    val inA = Files.createTempDirectory("ovl-a").toFile.getAbsolutePath
    val inB = Files.createTempDirectory("ovl-b").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("ovl-chk").toFile.getAbsolutePath

    def writeIntervals(dir: String, rows: Seq[(Long, String, String)], p: String): Unit =
      rows.map { case (id, st, en) => (id, ts(st), ts(en)) }
        .toDF(s"${p}_id", s"${p}_s", s"${p}_e")
        .coalesce(1).write.mode("append").parquet(dir)

    val schemaA = "a_id LONG, a_s TIMESTAMP, a_e TIMESTAMP"
    val schemaB = "b_id LONG, b_s TIMESTAMP, b_e TIMESTAMP"

    // batch 1: intervals engineered around a 30-min cell grid —
    //   a1 [10:00,10:30) overlaps b1 [10:15,10:45) ACROSS a cell edge
    //   a2 [11:00,11:20) overlaps b2 [11:10,11:25) inside one cell
    //   a3 [12:00,12:10) overlaps nothing
    writeIntervals(inA, Seq(
      (1L, "2024-01-01 10:00:00", "2024-01-01 10:30:00"),
      (2L, "2024-01-01 11:00:00", "2024-01-01 11:20:00"),
      (3L, "2024-01-01 12:00:00", "2024-01-01 12:10:00"),
    ), "a")
    writeIntervals(inB, Seq(
      (1L, "2024-01-01 10:15:00", "2024-01-01 10:45:00"),
      (2L, "2024-01-01 11:10:00", "2024-01-01 11:25:00"),
      // back-to-back with a1: [10:30,11:00) does NOT overlap half-open [10:00,10:30)
      (3L, "2024-01-01 10:30:00", "2024-01-01 11:00:00"),
    ), "b")

    val a = spark.readStream.schema(schemaA).option("maxFilesPerTrigger", 1).parquet(inA)
    val b = spark.readStream.schema(schemaB).option("maxFilesPerTrigger", 1).parquet(inB)
    val q = EventStream
      .overlapJoinStream(a, b, cellSeconds = 1800L, maxIntervalSeconds = 1800L)
      .writeStream
      .format("memory")
      .queryName("overlaps")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // batch 2: a LATE a-side interval still inside the watermark must
    // join b-state retained from batch 1 (cross-batch, no equality key)
    writeIntervals(inA, Seq((4L, "2024-01-01 10:40:00", "2024-01-01 10:55:00")), "a")
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT a_id, b_id FROM overlaps").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-overlap truth, straddle pair deduped, half-open edge excluded
    got shouldBe Set((1L, 1L), (2L, 2L), (4L, 1L), (4L, 3L))
  }

  test("overlapJoinStreamLevels: mixed 1-min and 1-day intervals, pair-identical to the exact overlap truth") {
    val s = spark
    import s.implicits._
    val inA = Files.createTempDirectory("ovl-la").toFile.getAbsolutePath
    val inB = Files.createTempDirectory("ovl-lb").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("ovl-lchk").toFile.getAbsolutePath

    def writeIntervals(dir: String, rows: Seq[(Long, String, String)], p: String): Unit =
      rows.map { case (id, st, en) => (id, ts(st), ts(en)) }
        .toDF(s"${p}_id", s"${p}_s", s"${p}_e")
        .coalesce(1).write.mode("append").parquet(dir)

    // a-side: 1-minute intervals scattered across the day (batch 1 stays
    // early so its watermark — max(a_s) − 1h — doesn't drop batch 2)
    val aRows1 = Seq(
      (1L, "2024-01-01 00:30:00", "2024-01-01 00:31:00"), // inside the day-long b1
      (2L, "2024-01-01 12:00:00", "2024-01-01 12:01:00"), // inside b1, overlaps short b2
    )
    // b-side: one DAY-long interval + a 1-min one — the length mix a
    // single grid can't price (a day on a minute grid = 1440 cells; the
    // level ladder registers it on a coarse cell instead)
    val bRows1 = Seq(
      (1L, "2024-01-01 00:00:00", "2024-01-02 00:00:00"),
      (2L, "2024-01-01 12:00:30", "2024-01-01 12:01:30"),
      (3L, "2024-01-02 00:00:00", "2024-01-02 00:01:00"), // back-to-back with b1: half-open, no overlap with it
    )
    writeIntervals(inA, aRows1, "a")
    writeIntervals(inB, bRows1, "b")

    val a = spark.readStream.schema("a_id LONG, a_s TIMESTAMP, a_e TIMESTAMP").option("maxFilesPerTrigger", 1).parquet(inA)
    val b = spark.readStream.schema("b_id LONG, b_s TIMESTAMP, b_e TIMESTAMP").option("maxFilesPerTrigger", 1).parquet(inB)
    // base 60 s, 12 levels -> top cell 60·2^11 s > 1 day = maxInterval
    val q = EventStream
      .overlapJoinStreamLevels(a, b, baseCellSeconds = 60L, levels = 12, maxIntervalSeconds = 86400L)
      .writeStream
      .format("memory")
      .queryName("overlaps_lvl")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // batch 2: a later short a-interval must still meet the day-long b1
    // retained in join state — the cross-batch, cross-LEVEL case (short
    // probe at b1's coarse registration level); plus one that overlaps
    // nothing
    val aRows2 = Seq(
      (3L, "2024-01-02 05:00:00", "2024-01-02 05:01:00"),
      (4L, "2024-01-01 23:30:00", "2024-01-01 23:31:00"),
    )
    writeIntervals(inA, aRows2, "a")
    q.processAllAvailable()
    q.stop()

    val got = spark.sql("SELECT a_id, b_id FROM overlaps_lvl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact-overlap truth over everything written, computed naively —
    // the batch kernel (overlapJoinAggLevels) is witnessed lossless
    // against this same predicate, so pair-parity here is kernel-parity
    val allA = aRows1 ++ aRows2
    val expected = (for {
      (aid, as_, ae) <- allA
      (bid, bs, be) <- bRows1
      if ts(as_).before(ts(be)) && ts(bs).before(ts(ae))
    } yield (aid, bid)).toSet
    got shouldBe expected
    expected should contain allOf ((1L, 1L), (2L, 1L), (2L, 2L), (4L, 1L))
  }

  test("sessionize emits a session once the gap passes the watermark") {
    val (glob, in, chk) = mkDirs()
    writeBatch(in, "b1", Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:10:00"), 1, "click", 2.0),
      EventStream.Event(3, ts("2024-01-01 10:12:00"), 2, "view", 5.0),
    ))
    val q = EventStream
      .sessionize(spark, EventStream.readEvents(spark, glob), gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // advance the watermark far enough to time out both open sessions
    writeBatch(in, "b2", Seq(EventStream.Event(9, ts("2024-01-01 13:00:00"), 3, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT user_id, session_start, session_end, n_events, total_value FROM sessions")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4)))
      .sortBy(_._1)
    out should contain((1L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.0))
    out should contain((2L, "2024-01-01 10:12:00.0", "2024-01-01 10:12:00.0", 1L, 5.0))
  }
}
