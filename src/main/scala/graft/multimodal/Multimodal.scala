package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: media payloads travel as opaque `binary` columns
  * next to typed metadata, and decode/feature work runs batched inside
  * `mapPartitions` so a vectorized codec (JNI image/audio lib on real
  * clusters) amortizes per-batch setup. The container has no media
  * libraries, so [[StubCodec]] is a clearly-marked deterministic fake —
  * the Spark-side plumbing (schema, batching, partitioning, typed
  * boundaries) is the real, tested part.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** A decoded frame: dimensions + dense pixels (row-major grayscale). */
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

  /** Deterministic fake: "decodes" a payload into an 8x8 grayscale frame
    * whose pixels derive from a rolling byte hash. Stands in for the
    * real decoder (not installable here); everything downstream treats
    * its output as real pixels.
    */
  object StubCodec extends Codec {
    override def decodeBatch(payloads: Seq[Array[Byte]]): Seq[Decoded] =
      payloads.map { bytes =>
        val px = new Array[Float](64)
        var h = 2166136261L
        var i = 0
        while (i < bytes.length) { h = (h ^ bytes(i)) * 16777619L; i += 1 }
        var j = 0
        while (j < 64) { h = h * 6364136223846793005L + 1442695040888963407L; px(j) = ((h >>> 40) & 0xff) / 255.0f; j += 1 }
        Decoded(8, 8, px)
      }
  }

  /** Documents -> media rows: the text payload stands in for real media
    * bytes; media_type cycles deterministically.
    */
  def asMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")), (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
      )
      .as[MediaRow]
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

  /** Frame sampling for video-typed rows: the stub synthesizes
    * `nFrames` per payload; real impl would seek the container. Output
    * stays long-form (doc_id, frame_idx, frame) — the layout that
    * partitions evenly downstream.
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
              (r.doc_id, f, base.pixels.map(p => math.min(1.0f, p + f * 0.01f)))
            }
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame")
  }
}
