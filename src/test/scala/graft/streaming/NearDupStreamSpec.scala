package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Streaming near-dup suppression: the keyed (band, sig) state store
  * must flag collisions within a batch AND across batches, never flag
  * unrelated documents, and share its signature kernel with the batch
  * MinHash family bit for bit.
  */
object NearDupStreamSpec {
  final case class Doc(doc_id: Long, text: String, lang: String, arrival: Timestamp)
}

class NearDupStreamSpec extends AnyFunSuite with Matchers with SparkSpec {
  import NearDupStreamSpec.Doc

  private def ts(s: String) = Timestamp.valueOf(s)

  private val tA = "the quick brown fox jumps over the lazy dog again and again today"
  private val tB = "completely different content about distributed query engines and parquet files"
  private val tC = "yet another unrelated document mentioning streaming state stores and watermarks"

  private def writeBatch(dir: String, rows: Seq[Doc]): Unit = {
    val s = spark
    import s.implicits._
    rows.toDF().coalesce(1).write.mode("append").parquet(dir)
  }

  test("band signatures match the batch MinHash kernel row for row") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      Doc(1, tA, "en", ts("2024-01-01 10:00:00")),
      Doc(2, tB, "en", ts("2024-01-01 10:00:01")),
      Doc(3, tC, "en", ts("2024-01-01 10:00:02")),
    ).toDF()
    val streamKernel = DocumentStream.bandSignatures(docs)
      .select("doc_id", "band", "sig")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    val batchKernel = graft.queries.DedupQueries.minhashBands(spark, docs)
      .select("doc_id", "band", "sig")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    streamKernel shouldBe batchKernel
    streamKernel.size shouldBe 12 // 3 docs x 4 bands
  }

  test("near-dups are flagged within a batch and across batches; unrelated docs never are") {
    val in = Files.createTempDirectory("neardup-in").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("neardup-chk").toFile.getAbsolutePath
    // batch 1: A (owner), B (same text, same batch), D (unrelated)
    writeBatch(in, Seq(
      Doc(1, tA, "en", ts("2024-01-01 10:00:00")),
      Doc(2, tA, "en", ts("2024-01-01 10:00:05")),
      Doc(4, tB, "en", ts("2024-01-01 10:00:06")),
    ))
    val q = DocumentStream
      .nearDupStream(DocumentStream.readDocs(spark, in))
      .writeStream
      .format("memory")
      .queryName("neardup")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // batch 2: C (same text as A, LATER batch — state must remember), E (unrelated)
    writeBatch(in, Seq(
      Doc(3, tA, "en", ts("2024-01-01 10:05:00")),
      Doc(5, tC, "en", ts("2024-01-01 10:05:01")),
    ))
    q.processAllAvailable()
    q.stop()

    val out = spark.sql("SELECT doc_id, band, dup_of FROM neardup")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // B collided with A in every band, in-batch (owner = earliest arrival)
    out.filter(_._1 == 2L).map(_._2).sorted.toSeq shouldBe Seq(0, 1, 2, 3)
    out.filter(_._1 == 2L).foreach(_._3 shouldBe 1L)
    // C collided with A across batches — the state store carried the owner
    out.filter(_._1 == 3L).map(_._2).sorted.toSeq shouldBe Seq(0, 1, 2, 3)
    out.filter(_._1 == 3L).foreach(_._3 shouldBe 1L)
    // unrelated docs are never flagged, and owners are never self-flagged
    out.map(_._1).toSet shouldBe Set(2L, 3L)
  }
}
