package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: treat a payload as an opaque `binary`
  * column with typed metadata (`multimodal_meta`, oracled), and run the
  * REAL decode path (`multimodal_decode`): deterministic PNG/WAV bytes in
  * the binary column, decoded batched via JDK ImageIO / AudioSystem in
  * `graft.multimodal.Multimodal.JdkCodec`. DuckDB has no image codec, so
  * the decode query is no_oracle; MultimodalSpec pins bit-exact decoded
  * pixels/samples against the generator's ground truth.
  */
object MultimodalQueries {

  val qs: Seq[Q] = Seq(
    // frame-sample each video payload's real decoded keyframe, resize
    // every frame to a fixed 4x4 model-input grid, emit per-frame pixel
    // stats — the decode -> sample -> normalize front half of a vision
    // training pipeline, end-to-end on real PNG bytes. no_oracle (no
    // image codec in DuckDB); MultimodalSpec pins decode/resize/sample
    // exactness component-wise.
    Q.noOracle("multimodal_frames") { (s, d) =>
      import graft.multimodal.Multimodal
      import s.implicits._
      val media = Multimodal.asMedia(s, Tables.documents(s, d))
      val frames = Multimodal.sampleFrames(media, Multimodal.JdkCodec, nFrames = 3)
      // each long-form frame re-enters the typed resize path
      val decoded = frames
        .select(col("doc_id"), col("frame_idx"), col("frame"))
        .as[(Long, Int, Array[Float])]
        .map { case (id, idx, px) =>
          // frames of a doc share dims with its keyframe: recover them
          val w = 6 + (id % 4).toInt
          val h = 5 + ((id / 4) % 4).toInt
          (id * 10 + idx, Multimodal.Decoded(w, h, px))
        }
      Multimodal.resize(decoded, 4, 4)
        .map { case (key, dd) =>
          (key / 10, (key % 10).toInt, dd.pixels.sum / dd.pixels.length)
        }
        .toDF("doc_id", "frame_idx", "mean_intensity")
        .select(col("doc_id"), col("frame_idx"), round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy("doc_id", "frame_idx")
    },

    Q.noOracle("multimodal_decode") { (s, d) =>
      import graft.multimodal.Multimodal
      val media = Multimodal.asMedia(s, Tables.documents(s, d))
      Multimodal.extractFeatures(media, Multimodal.JdkCodec)
        .toDF()
        .select(
          col("doc_id"),
          col("media_type"),
          col("n_bytes"),
          col("width"),
          col("height"),
          round(col("mean_intensity"), 4).as("mean_intensity"),
        )
        .orderBy("doc_id")
    },
    Q(
      "multimodal_meta",
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(octet_length(encode(text)) % 640 AS INTEGER) AS fake_width,
        | CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS fake_height,
        | md5(text) AS checksum
        |FROM documents ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", encode(col("text"), "UTF-8")) // binary column
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          (length(col("payload")) % 640).as("fake_width"),
          (length(col("payload")) * 7 % 480).as("fake_height"),
          md5(col("text")).as("checksum"),
        )
        .orderBy("doc_id")
    },
  )
}
