package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Streaming document cleaning end-to-end through a real file source:
  * quality gate, literal-set decontamination, and watermarked exact
  * dedup — including across micro-batches within the watermark.
  */
class DocumentStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def writeBatch(dir: String, name: String, rows: Seq[(Long, String, String, Timestamp)]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang", "arrival")
      .coalesce(1).write.mode("append").parquet(s"$dir/$name")
  }

  test("stream drops short, contaminated, and duplicate docs; keeps the rest") {
    val in = Files.createTempDirectory("graft-docstream-in").toFile
    val ckpt = Files.createTempDirectory("graft-docstream-ckpt").toFile
    try {
      val s = spark
      import s.implicits._
      val benchmark = Seq((900L, "alpha beta gamma delta epsilon zeta", "en"))
        .toDF("doc_id", "text", "lang")
      val evalSh = DocumentStream.benchmarkShingles(benchmark)
      evalSh should not be empty

      val clean = "one two three four five six seven"
      val contaminated = "X alpha beta gamma delta epsilon Y" // shares a 5-gram with the benchmark
      val short = "too short"
      writeBatch(in.getAbsolutePath, "b1", Seq(
        (1L, clean, "en", ts("2026-01-01 10:00:00")),
        (2L, contaminated, "en", ts("2026-01-01 10:00:01")),
        (3L, short, "en", ts("2026-01-01 10:00:02")),
        (4L, clean, "en", ts("2026-01-01 10:00:03")), // duplicate content of 1
      ))
      // second batch: another duplicate (within watermark) + a new clean doc
      writeBatch(in.getAbsolutePath, "b2", Seq(
        (5L, clean, "en", ts("2026-01-01 10:01:00")),
        (6L, "eight nine ten eleven twelve thirteen", "en", ts("2026-01-01 10:01:01")),
      ))

      val out = DocumentStream.cleanStream(
        DocumentStream.readDocs(spark, in.getAbsolutePath + "/*"),
        evalSh,
      )
      val q = out.writeStream
        .format("memory")
        .queryName("clean_docs")
        .outputMode("append")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .start()
      try q.processAllAvailable()
      finally q.stop()

      val rows = spark.sql("SELECT doc_id FROM clean_docs").collect().map(_.getLong(0)).toSet
      // exactly one of the three duplicate-content docs survives, plus doc 6
      withClue(rows) {
        rows should contain(6L)
        rows.intersect(Set(1L, 4L, 5L)).size shouldBe 1
        rows should contain noneOf (2L, 3L)
      }
    } finally {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
      rm(in); rm(ckpt)
    }
  }

  test("benchmarkShingles refuses an over-limit benchmark") {
    val s = spark
    import s.implicits._
    val big = Seq((1L, "a b c d e f g h i j", "en")).toDF("doc_id", "text", "lang")
    an[IllegalArgumentException] should be thrownBy
      DocumentStream.benchmarkShingles(big, maxShingles = 2)
  }
}
