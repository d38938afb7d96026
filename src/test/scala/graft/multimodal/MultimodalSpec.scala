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
    Multimodal.JdkCodec.decodeBatch(payloads)
  }
}

class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The exact float the codec produces for an 8-bit gray value v
    * (r=g=b=v), replicated operation-for-operation. */
  private def luma(v: Int): Float = (0.299f * v + 0.587f * v + 0.114f * v) / 255.0f

  test("JdkCodec decodes a real PNG to the exact encoded pixel values") {
    // PNG is lossless: decode(encode(pixels)) must be bit-exact.
    for (docId <- Seq(1L, 7L, 123456L); (w, h) <- Seq((8, 8), (6, 5), (9, 7))) {
      val bytes = Multimodal.syntheticPng(docId, w, h)
      // real PNG container, not a stand-in
      (bytes(0) & 0xff) shouldBe 0x89
      new String(bytes.slice(1, 4), "US-ASCII") shouldBe "PNG"
      val Seq(d) = Multimodal.JdkCodec.decodeBatch(Seq(bytes))
      d.width shouldBe w
      d.height shouldBe h
      val expected = Multimodal.syntheticPixels(docId, w, h).map(luma)
      d.pixels.toSeq shouldBe expected.toSeq
    }
  }

  test("JdkCodec decodes a real JPEG (lossy: dims exact, pixels close)") {
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val vs = Multimodal.syntheticPixels(42L, 8, 8)
    for (y <- 0 until 8; x <- 0 until 8) {
      val v = vs(y * 8 + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out) shouldBe true
    val Seq(d) = Multimodal.JdkCodec.decodeBatch(Seq(out.toByteArray))
    d.width shouldBe 8
    d.height shouldBe 8
    // JPEG at default quality: every pixel within a coarse tolerance,
    // mean within a tight one
    d.pixels.lazyZip(vs.map(luma)).foreach((got, want) => math.abs(got - want) should be < 0.25f)
    math.abs(d.pixels.sum / 64 - vs.map(luma).sum / 64) should be < 0.02f
  }

  test("JdkCodec decodes a real WAV to the exact encoded samples") {
    for (docId <- Seq(2L, 99L); n <- Seq(32, 64)) {
      val bytes = Multimodal.syntheticWav(docId, n)
      new String(bytes.slice(0, 4), "US-ASCII") shouldBe "RIFF"
      val Seq(d) = Multimodal.JdkCodec.decodeBatch(Seq(bytes))
      d.width shouldBe n
      d.height shouldBe 1
      val expected = Multimodal.syntheticSamples(docId, n).map(s => (s / 32768.0f + 1.0f) / 2.0f)
      d.pixels.toSeq shouldBe expected.toSeq
    }
  }

  test("JdkCodec fails fast on an undecodable payload") {
    an[IllegalArgumentException] should be thrownBy
      Multimodal.JdkCodec.decodeBatch(Seq("not an image at all".getBytes("UTF-8")))
  }

  test("extractFeatures decodes real payloads: per-row dims match the generator") {
    val media = Multimodal.asMedia(spark, Tables.documents(spark, sf))
    val feats = Multimodal.extractFeatures(media, Multimodal.JdkCodec).collect()
    feats.length shouldBe 500
    feats.foreach { f =>
      f.n_bytes should be > 0
      f.embedding.length shouldBe 8
      f.mean_intensity should (be >= 0.0f and be <= 1.0f)
      if (f.media_type == "audio") {
        f.width shouldBe 32 + (f.doc_id % 5).toInt * 8
        f.height shouldBe 1
      } else {
        f.width shouldBe 6 + (f.doc_id % 4).toInt
        f.height shouldBe 5 + ((f.doc_id / 4) % 4).toInt
      }
    }
    // and the image means are the true decoded means, not a hash artifact
    val byId = feats.map(f => f.doc_id -> f).toMap
    val img = feats.filter(_.media_type != "audio").take(5)
    img.foreach { f =>
      val px = Multimodal.syntheticPixels(f.doc_id, f.width, f.height).map(luma)
      byId(f.doc_id).mean_intensity shouldBe (px.sum / px.length)
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
    val a = Multimodal.extractFeatures(media, Multimodal.JdkCodec).collect().sortBy(_.doc_id)
    val b = Multimodal.extractFeatures(media, Multimodal.JdkCodec).collect().sortBy(_.doc_id)
    a.map(_.mean_intensity).toSeq shouldBe b.map(_.mean_intensity).toSeq
  }

  test("resize maps every output pixel from the nearest source pixel") {
    val s = spark
    import s.implicits._
    // fixed 8x8 real PNGs so the integer-upscale roundtrip is exact
    val media = (1L to 20L).map(id => Multimodal.MediaRow(id, "image", Multimodal.syntheticPng(id, 8, 8))).toDS()
    val decoded = media.mapPartitions { rows =>
      rows.grouped(16).flatMap { b =>
        b.lazyZip(Multimodal.JdkCodec.decodeBatch(b.map(_.payload))).map((r, d) => (r.doc_id, d))
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
    nVideos should be > 0L
    val frames = Multimodal.sampleFrames(media, Multimodal.JdkCodec, nFrames = 3)
    frames.count() shouldBe nVideos * 3
    frames.columns.toSeq shouldBe Seq("doc_id", "frame_idx", "width", "height", "frame")
    // the carried dims are the decoded keyframe's, row by row
    import spark.implicits._
    val dims = frames.select("doc_id", "width", "height").distinct()
      .as[(Long, Int, Int)].collect().map { case (id, w, h) => id -> (w, h) }.toMap
    val truth = media.filter(_.media_type == "video").collect().map { r =>
      val d = Multimodal.JdkCodec.decodeBatch(Seq(r.payload)).head
      r.doc_id -> (d.width, d.height)
    }.toMap
    dims shouldBe truth
  }
}
