package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Checkpoint-based restart: a stopped query resumed with the same
  * checkpoint continues from the committed offsets — already-processed
  * input files are not reprocessed (the exactly-once property that makes
  * the streaming surface production-usable).
  */
class StreamRestartSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeBatch(dir: String, rows: Seq[EventStream.Event]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF().coalesce(1).write.mode("append").parquet(dir)
  }

  test("a restarted query resumes from the checkpoint without duplicates") {
    val in = Files.createTempDirectory("restart-in").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("restart-chk").toFile.getAbsolutePath
    val out = Files.createTempDirectory("restart-out").toFile.getAbsolutePath

    def start() = EventStream.readEvents(spark, in)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", chk)
      .outputMode("append")
      .start()

    writeBatch(in, Seq(
      EventStream.Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      EventStream.Event(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0),
    ))
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()

    // second batch lands while the query is DOWN
    writeBatch(in, Seq(EventStream.Event(3, ts("2024-01-01 10:02:00"), 2, "click", 3.0)))

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()

    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    ids shouldBe Array(1L, 2L, 3L) // no event lost, none duplicated
  }
}
