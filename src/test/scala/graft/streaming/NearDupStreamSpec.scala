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

  // a long doc and a suffixed variant: high containment (the suffix adds
  // a few shingles to an otherwise identical set) makes a band collision
  // near-certain while the exact Jaccard stays clearly below 0.95 — the
  // LSH false positive the verify stage exists to reject. Fixture is
  // fixed, kernel is deterministic: the collision precondition below is
  // asserted, not assumed.
  private val tLong = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima " +
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey xray " +
    "yankee zulu one two three four five six seven eight nine ten eleven twelve").trim
  private val tSuffixed = tLong + " thirteen fourteen fifteen"

  private def shingleSet(text: String): Set[Seq[String]] =
    text.split(" ").toSeq.sliding(3).map(_.toSeq).toSet

  private def pairJaccard(x: String, y: String): Double = {
    val (a, b) = (shingleSet(x), shingleSet(y))
    a.intersect(b).size.toDouble / a.union(b).size
  }

  test("verify stage: a band-colliding-but-low-Jaccard pair is NOT flagged; exact dups still are") {
    val s = spark
    import s.implicits._
    // precondition: the pair really is an LSH candidate under the kernel
    val fixture = Seq(
      Doc(1, tLong, "en", ts("2024-01-01 10:00:00")),
      Doc(2, tSuffixed, "en", ts("2024-01-01 10:00:01")),
    ).toDF()
    val sigs = DocumentStream.bandSignatures(fixture)
      .select("doc_id", "band", "sig")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val shared = sigs.filter(_._1 == 1L).map(x => (x._2, x._3)).toSet
      .intersect(sigs.filter(_._1 == 2L).map(x => (x._2, x._3)).toSet)
    withClue("fixture must band-collide for the test to mean anything: ") { shared should not be empty }
    val jac = pairJaccard(tLong, tSuffixed)
    withClue(s"fixture Jaccard $jac must be below the 0.95 gate: ") { jac should be < 0.95 }

    val in = Files.createTempDirectory("neardup-vin").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("neardup-vchk").toFile.getAbsolutePath
    writeBatch(in, Seq(Doc(1, tLong, "en", ts("2024-01-01 10:00:00"))))
    val q = DocumentStream
      .nearDupStream(DocumentStream.readDocs(spark, in), verifyMinJaccard = Some(0.95))
      .writeStream
      .format("memory")
      .queryName("neardup_verified")
      .outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    q.processAllAvailable()
    // cross-batch: the suffixed variant band-collides with doc 1's state
    // but fails exact verification; the exact duplicate passes it
    writeBatch(in, Seq(
      Doc(2, tSuffixed, "en", ts("2024-01-01 10:02:00")),
      Doc(3, tLong, "en", ts("2024-01-01 10:02:01")),
    ))
    q.processAllAvailable()
    q.stop()
    val out = spark.sql("SELECT doc_id, dup_of FROM neardup_verified")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    out.map(_._1).toSet shouldBe Set(3L)
    out.foreach(_._2 shouldBe 1L)
  }

  test("store-backed verify: low-Jaccard band collisions rejected, history verified without re-shingling") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("neardup-vstore").toFile.getAbsolutePath + "/bands"

    // batch 1 through the store front end (verifying): absorbs doc 1 +
    // its hidden .hs sidecar
    val b1 = Seq(Doc(1, tLong, "en", ts("2024-01-01 10:00:00"))).toDF()
    DocumentStream.screenAndAbsorbBatch(b1, store, verifyMinJaccard = Some(0.95))
      .count() shouldBe 0L

    // batch 2: suffixed variant collides vs the STORE but fails the
    // exact-Jaccard gate (verified against .hs, history text never
    // re-read); the exact dup passes; within-batch exact pair (4 vs 3)
    // also passes
    val b2 = Seq(
      Doc(2, tSuffixed, "en", ts("2024-01-01 10:05:00")),
      Doc(3, tLong, "en", ts("2024-01-01 10:05:01")),
      Doc(4, tLong, "en", ts("2024-01-01 10:05:02")),
    ).toDF()
    val flags = DocumentStream.screenAndAbsorbBatch(b2, store, verifyMinJaccard = Some(0.95))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    flags shouldBe Set((3L, 1L), (4L, 1L), (4L, 3L))

    // unverified screening over the same store still reports the raw
    // candidate (the band collision exists; only the verdict differs)
    val raw = graft.operators.BandsStore.screen(spark, Seq(Doc(9, tSuffixed, "en", ts("2024-01-01 11:00:00"))).toDF(), store)
      .select("old_doc").collect().map(_.getLong(0)).toSet
    raw should contain(2L)
  }

  test("store screen: hash-less history degrades to band semantics; re-ingest never self-flags") {
    val s = spark
    import s.implicits._
    val store = Files.createTempDirectory("neardup-legacy").toFile.getAbsolutePath + "/bands"

    // history absorbed through the PLAIN band front end — band rows
    // exist but NO .hs shingle sets (the pre-verification store shape)
    graft.operators.BandsStore.build(
      spark, Seq(Doc(100, tA, "en", ts("2024-01-01 09:00:00"))).toDF(), store)

    // a true duplicate of the hash-less history doc: it cannot be
    // VERIFIED, and must degrade to the flagged band-collision rather
    // than silently pass as unique
    val f1 = DocumentStream.screenAndAbsorbBatch(
      Seq(Doc(1, tA, "en", ts("2024-01-01 10:00:00"))).toDF(), store,
      verifyMinJaccard = Some(0.5),
    ).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    f1 shouldBe Set((1L, 100L))

    // re-ingesting doc 1 (absorbed above, WITH its hash set): its band
    // rows collide with themselves in every band — the flag against
    // history must be (1, 100), never the self-pair (1, 1)
    val f2 = DocumentStream.screenAndAbsorbBatch(
      Seq(Doc(1, tA, "en", ts("2024-01-01 10:05:00"))).toDF(), store,
      verifyMinJaccard = Some(0.5),
    ).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    f2 should not contain ((1L, 1L))
    f2 should contain((1L, 100L))
  }
}
