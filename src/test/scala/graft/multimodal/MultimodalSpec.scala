package graft.multimodal

import scala.jdk.CollectionConverters._

import org.apache.spark.util.CollectionAccumulator
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Codec that records batch sizes via an accumulator (closures are
  * serialized per task even in local mode — plain fields won't do; and
  * it must be top-level so no suite `$outer` is captured).
  */
class RecordingCodec(val batches: CollectionAccumulator[Int]) extends Multimodal.Codec {
  override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Multimodal.Decoded] = {
    batches.add(payloads.size)
    Multimodal.StubCodec.decodeBatch(payloads)
  }
}

class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("extractFeatures produces typed features for every row") {
    val media = Multimodal.asMedia(spark, Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(media, Multimodal.StubCodec).collect()
    feats.length shouldBe 500
    feats.foreach { f =>
      f.width shouldBe 8
      f.height shouldBe 8
      f.n_bytes should be > 0
      f.embedding.length shouldBe 8
      f.mean_intensity should (be >= 0.0f and be <= 1.0f)
    }
  }

  test("decode is called in batches, never per-row") {
    val media = Multimodal.asMedia(spark, Tables.documents(spark, sf)).repartition(4)
    val codec = new RecordingCodec(spark.sparkContext.collectionAccumulator[Int]("batches"))
    Multimodal.extractFeatures(media, codec, batchSize = 32).count() shouldBe 500L
    val sizes = codec.batches.value.asScala.toSeq
    sizes.max should be <= 32
    // 500 rows / 4 partitions / 32-batches -> far fewer calls than rows
    sizes.size should be < 30
    sizes.sum shouldBe 500
  }

  test("features are deterministic") {
    val media = Multimodal.asMedia(spark, Tables.documents(spark, sf))
    val a = Multimodal.extractFeatures(media, Multimodal.StubCodec).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(media, Multimodal.StubCodec).collect().sortBy(_.doc_id)
    a.map(_.mean_intensity).toSeq shouldBe b.map(_.mean_intensity).toSeq
  }

  test("resize maps every output pixel from the nearest source pixel") {
    val s = spark
    import s.implicits._
    val media = Multimodal.asMedia(spark, Tables.documents(spark, sf)).limit(20)
    val decoded = media.mapPartitions { rows =>
      rows.grouped(16).flatMap { b =>
        b.lazyZip(Multimodal.StubCodec.decodeBatch(b.map(_.payload))).map((r, d) => (r.doc_id, d))
      }
    }
    // upscale 8x8 -> 16x16: every source pixel appears exactly 4 times
    val up = Multimodal.resize(decoded, 16, 16).collect()
    up.length shouldBe 20
    up.foreach { case (_, d) =>
      d.width shouldBe 16
      d.height shouldBe 16
      d.pixels.length shouldBe 256
    }
    val src = decoded.collect().toMap
    up.foreach { case (id, d) =>
      val orig = src(id)
      // corner pixels survive; 2x2 blocks are constant
      d.pixels(0) shouldBe orig.pixels(0)
      d.pixels(1) shouldBe orig.pixels(0)
      d.pixels(16) shouldBe orig.pixels(0)
      d.pixels(255) shouldBe orig.pixels(63)
    }
    // downscale back 16x16 -> 8x8 reproduces the original exactly
    // (nearest-neighbor inverse of an integer upscale)
    val down = Multimodal.resize(Multimodal.resize(decoded, 16, 16), 8, 8).collect().toMap
    down.foreach { case (id, d) => d.pixels.toSeq shouldBe src(id).pixels.toSeq }
  }

  test("sampleFrames emits nFrames rows per video payload") {
    val media = Multimodal.asMedia(spark, Tables.documents(spark, sf))
    val nVideos = media.filter(_.media_type == "video").count()
    val frames = Multimodal.sampleFrames(media, Multimodal.StubCodec, nFrames = 3)
    frames.count() shouldBe nVideos * 3
    frames.columns.toSeq shouldBe Seq("doc_id", "frame_idx", "frame")
  }
}
