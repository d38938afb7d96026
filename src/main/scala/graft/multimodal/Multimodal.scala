package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.MessageDigest
import javax.imageio.ImageIO
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads travel as opaque `binary` columns
  * next to typed metadata, and decode/feature work runs batched inside
  * `mapPartitions` so a vectorized codec amortizes per-batch setup.
  *
  * The payloads are REAL encoded media — PNG images written with
  * `javax.imageio.ImageIO` and 16-bit PCM WAV written with
  * `javax.sound.sampled.AudioSystem` — and [[JdkCodec]] decodes them with
  * the same JDK-builtin libraries (zero external dependencies). A
  * production deployment would swap [[JdkCodec]] for a JNI-backed
  * vectorized decoder behind the same [[Codec]] boundary; nothing
  * downstream changes.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** A decoded frame: dimensions + dense samples, row-major. For images
    * `pixels` is grayscale luma in [0,1]; for audio `height == 1` and
    * `pixels` is the PCM signal shifted to [0,1] (`(s/32768 + 1)/2`) so a
    * single feature pipeline spans both modalities.
    */
  final case class Decoded(width: Int, height: Int, pixels: Array[Float])

  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      mean_intensity: Float,
      embedding: Array[Float],
  )

  /** Codec boundary. A production implementation wraps an image/audio
    * decoder; decode is *batched* because real codecs are vectorized /
    * have heavy per-call setup.
    */
  trait Codec extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Decoded]
  }

  /** Real decoder over JDK-builtin codecs, dispatched on magic bytes:
    * PNG (`89 50 4E 47`) and JPEG (`FF D8`) via `ImageIO.read`, WAV
    * (`RIFF`) via `AudioSystem`. Undecodable payloads fail fast — a
    * corrupt object in the binary column is a data bug, not something to
    * paper over with a default frame.
    */
  object JdkCodec extends Codec {
    // ImageIO's default stream cache spills through temp files; pure
    // in-memory decode wants it off (safe to set per-executor-JVM).
    ImageIO.setUseCache(false)

    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Decoded] =
      payloads.map { bytes =>
        if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x52 && (bytes(1) & 0xff) == 0x49 &&
          (bytes(2) & 0xff) == 0x46 && (bytes(3) & 0xff) == 0x46) decodeWav(bytes)
        else decodeImage(bytes)
      }

    private def decodeImage(bytes: Array[Byte]): Decoded = {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      require(img != null, s"undecodable image payload (${bytes.length} bytes)")
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Float](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          // ITU-R BT.601 luma, normalized to [0,1]
          px(y * w + x) = (0.299f * r + 0.587f * g + 0.114f * b) / 255.0f
          x += 1
        }
        y += 1
      }
      Decoded(w, h, px)
    }

    private def decodeWav(bytes: Array[Byte]): Decoded = {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got ${fmt.getSampleSizeInBits}")
        val raw = in.readAllBytes()
        val n = raw.length / 2
        val px = new Array[Float](n)
        var i = 0
        while (i < n) {
          val lo = raw(2 * i) & 0xff
          val hi = raw(2 * i + 1).toInt // sign-extends
          val s = if (fmt.isBigEndian) ((lo << 8) | (hi & 0xff)).toShort else ((hi << 8) | lo).toShort
          px(i) = (s / 32768.0f + 1.0f) / 2.0f
          i += 1
        }
        Decoded(n, 1, px)
      } finally in.close()
    }
  }

  /** Deterministic tiny grayscale PNG: `w x h`, pixel values from a
    * splitmix-style LCG seeded by `docId` (r=g=b so the BT.601 luma of a
    * decoded pixel is exactly `v * (0.299+0.587+0.114) / 255` in float —
    * PNG is lossless, so the round trip is bit-exact).
    */
  def syntheticPng(docId: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var s = docId
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = s * 6364136223846793005L + 1442695040888963407L
        val v = ((s >>> 40) & 0xff).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** The raw 8-bit values `syntheticPng(docId, w, h)` encodes, row-major —
    * the ground truth a decode witness compares against.
    */
  def syntheticPixels(docId: Long, w: Int = 8, h: Int = 8): Array[Int] = {
    val vs = new Array[Int](w * h)
    var s = docId
    var i = 0
    while (i < w * h) {
      s = s * 6364136223846793005L + 1442695040888963407L
      vs(i) = ((s >>> 40) & 0xff).toInt
      i += 1
    }
    vs
  }

  /** Deterministic mono 16-bit PCM WAV: `nSamples` at 8 kHz, samples from
    * the same LCG family (full 16-bit signed range). WAV PCM is lossless,
    * so decoded samples are bit-exact against [[syntheticSamples]].
    */
  def syntheticWav(docId: Long, nSamples: Int = 64): Array[Byte] = {
    val samples = syntheticSamples(docId, nSamples)
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      data(2 * i) = (samples(i) & 0xff).toByte
      data(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Ground-truth signed 16-bit samples behind `syntheticWav`. */
  def syntheticSamples(docId: Long, nSamples: Int = 64): Array[Short] = {
    val vs = new Array[Short](nSamples)
    var s = docId ^ 0x5dee66d5deadbeefL
    var i = 0
    while (i < nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      vs(i) = ((s >>> 32) & 0xffff).toShort
      i += 1
    }
    vs
  }

  /** Documents -> media rows carrying REAL encoded payloads: image/video
    * rows get a deterministic PNG (video's payload stands in for a
    * keyframe), audio rows a deterministic WAV. Dimensions vary by doc_id
    * so width/height extraction is observable, not a constant. Encoding
    * runs distributed (one `ImageIO.write` per row inside the partition
    * map) — at 100 TB the payloads arrive pre-encoded via `binaryFile`
    * and this generator disappears; see SourcesSpec's binaryFile path.
    */
  def asMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val mt = (id % 3) match {
            case 0 => "image"
            case 1 => "audio"
            case _ => "video"
          }
          val payload = mt match {
            case "audio" => syntheticWav(id, 32 + (id % 5).toInt * 8)
            case _       => syntheticPng(id, 6 + (id % 4).toInt, 5 + ((id / 4) % 4).toInt)
          }
          MediaRow(id, mt, payload)
        }
      }
  }

  /** Batched decode + feature extraction. Partition-parallel; each task
    * calls the codec once per `batchSize` rows (the shape a Pandas-UDF /
    * Arrow batch would have), never once per row.
    */
  def extractFeatures(media: Dataset[MediaRow], codec: Codec, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // one digest per partition — getInstance is a JCA provider lookup,
      // not something to pay per row; digest() resets it between calls
      val md5 = MessageDigest.getInstance("MD5")
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = codec.decodeBatch(batch.map(_.payload))
        batch.lazyZip(decoded).map { (r, d) =>
          val mean = d.pixels.sum / d.pixels.length
          val md = md5.digest(r.payload)
          val emb = md.take(8).map(b => (b & 0xff) / 255.0f)
          MediaFeatures(r.doc_id, r.media_type, r.payload.length, d.width, d.height, mean, emb)
        }
      }
    }
  }

  /** Nearest-neighbor resize of decoded frames to `(outW, outH)` —
    * the normalization step every vision pipeline runs before batching
    * into a model. Pure arithmetic on the decoded pixels (no codec), so
    * unlike decode it needs no batching; it rides the same
    * partition-parallel typed path. Output embeds the new dimensions so
    * downstream schema stays self-describing.
    */
  def resize(decoded: Dataset[(Long, Decoded)], outW: Int, outH: Int): Dataset[(Long, Decoded)] = {
    val spark = decoded.sparkSession
    import spark.implicits._
    decoded.map { case (id, d) =>
      val px = new Array[Float](outW * outH)
      var y = 0
      while (y < outH) {
        val srcY = math.min(d.height - 1, y * d.height / outH)
        var x = 0
        while (x < outW) {
          val srcX = math.min(d.width - 1, x * d.width / outW)
          px(y * outW + x) = d.pixels(srcY * d.width + srcX)
          x += 1
        }
        y += 1
      }
      (id, Decoded(outW, outH, px))
    }
  }

  /** Frame sampling for video-typed rows: the payload is a single real
    * keyframe (a PNG); `nFrames` variants are synthesized from it by a
    * deterministic brightness ramp (a real impl would seek the container
    * for distinct keyframes). Output stays long-form
    * (doc_id, frame_idx, frame) — the layout that partitions evenly
    * downstream.
    */
  def sampleFrames(media: Dataset[MediaRow], codec: Codec, nFrames: Int = 3, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(_.media_type == "video")
      .mapPartitions { rows =>
        // batched like extractFeatures — one codec call per batch, never
        // per row
        rows.grouped(batchSize).flatMap { batch =>
          val decoded = codec.decodeBatch(batch.map(_.payload))
          batch.lazyZip(decoded).flatMap { (r, base) =>
            (0 until nFrames).map { f =>
              // dimensions ride WITH each frame row (two ints next to a
              // pixel array): downstream resize/normalize stages must
              // never have to reverse-engineer them from doc_id
              (r.doc_id, f, base.width, base.height, base.pixels.map(p => math.min(1.0f, p + f * 0.01f)))
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "width", "height", "frame")
  }
}
