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

  test("store-backed screen: stream and batch dedup share one corpus memory") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("neardup-store").toFile.getAbsolutePath + "/bands"
    val in = Files.createTempDirectory("neardup-in2").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("neardup-chk2").toFile.getAbsolutePath

    // corpus history absorbed through the BATCH front end
    val history = Seq(Doc(100, tA, "en", ts("2024-01-01 09:00:00"))).toDF()
    graft.operators.BandsStore.build(spark, history, store)

    val flags = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    writeBatch(in, Seq(
      Doc(1, tA, "en", ts("2024-01-01 10:00:00")), // dup of history doc 100
      Doc(2, tB, "en", ts("2024-01-01 10:00:01")), // fresh
    ))
    val q = DocumentStream.readDocs(spark, in)
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        flags ++= DocumentStream.screenAndAbsorbBatch(batch, store)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        ()
      }
      .start()
    q.processAllAvailable()
    // doc 1 collided with the BATCH-built history in all bands -> one
    // distinct flag; doc 2 is clean and was absorbed
    flags.toSet shouldBe Set((1L, 100L))

    // next micro-batch: dup of the ABSORBED doc 2 -> the stream's own
    // past is remembered through the store, not query state
    writeBatch(in, Seq(Doc(3, tB, "en", ts("2024-01-01 10:05:00"))))
    q.processAllAvailable()
    q.stop()
    flags.toSet shouldBe Set((1L, 100L), (3L, 2L))

    // and the BATCH front end sees everything the stream absorbed
    val probe = Seq(Doc(9, tB, "en", ts("2024-01-01 11:00:00"))).toDF()
    val batchView = graft.operators.BandsStore.screen(spark, probe, store)
      .select("old_doc").collect().map(_.getLong(0)).toSet
    batchView shouldBe Set(2L, 3L)
  }
}
