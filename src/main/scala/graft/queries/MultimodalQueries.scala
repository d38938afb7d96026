package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: treat a payload as an opaque `binary`
  * column with typed metadata (`multimodal_meta`, oracled), and run the
  * REAL decode path (`multimodal_decode`): deterministic PNG/WAV bytes in
  * the binary column, decoded batched via JDK ImageIO / AudioSystem in
  * `graft.multimodal.Multimodal.JdkCodec`. DuckDB has no image codec, so
  * the image decode queries are no_oracle; MultimodalSpec pins bit-exact
  * decoded pixels/samples against the generator's ground truth. The
  * AUDIO path goes further: `multimodal_audio_features` IS oracled —
  * the WAV samples are a pure LCG of doc_id, so DuckDB replays the
  * formula while Spark decodes the real bytes, differential-testing the
  * encode→decode round trip itself.
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
      // each long-form frame re-enters the typed resize path; its
      // dimensions arrive ON the row (sampleFrames carries them from the
      // decoded keyframe — no generator-formula coupling here)
      val decoded = frames
        .select(col("doc_id"), col("frame_idx"), col("width"), col("height"), col("frame"))
        .as[(Long, Int, Int, Int, Array[Float])]
        .map { case (id, idx, w, h, px) =>
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
    // ----- ORACLED audio decode: Spark decodes the REAL WAV bytes
    // (AudioSystem inside the batched codec boundary) and reduces the
    // PCM to integer-exact features; DuckDB replays the generator's LCG
    // formula in HUGEINT arithmetic (mod-2^64 wraparound that BIGINT's
    // overflow checks would reject) and computes the same features —
    // the one place the codec ROUND TRIP itself is differential-tested,
    // not just spec-pinned. Features stay in integer arithmetic
    // (energy = Σv², peak = max|v|, sign-change count) so no float ever
    // enters the comparison. The [0,1] float shift the codec applies is
    // inverted exactly: v/32768 and the ±1/÷2 shifts are all
    // power-of-two float ops, lossless for 16-bit samples.
    Q(
      "multimodal_audio_features",
      """WITH RECURSIVE audio AS (
        |  SELECT doc_id, CAST(32 + (doc_id % 5) * 8 AS INTEGER) AS n,
        |         xor(doc_id, 6768460358734429935) AS x  -- doc_id ^ 0x5dee66d5deadbeef, both >= 0
        |  FROM documents WHERE doc_id % 3 = 1),
        |seq AS (
        |  SELECT doc_id, n, 1 AS i,
        |         (CAST(x AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
        |           % 18446744073709551616 AS u
        |  FROM audio
        |  UNION ALL
        |  SELECT doc_id, n, i + 1,
        |         (u * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
        |  FROM seq WHERE i < n),
        |pcm AS (
        |  SELECT doc_id, i,
        |         CASE WHEN CAST((u // 4294967296) % 65536 AS BIGINT) >= 32768
        |              THEN CAST((u // 4294967296) % 65536 AS BIGINT) - 65536
        |              ELSE CAST((u // 4294967296) % 65536 AS BIGINT) END AS v
        |  FROM seq),
        |lagged AS (
        |  SELECT doc_id, v, lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        |  FROM pcm)
        |SELECT doc_id,
        |       CAST(count(*) AS INTEGER) AS n_samples,
        |       CAST(sum(CASE WHEN pv IS NOT NULL AND ((v >= 0) != (pv >= 0)) THEN 1 ELSE 0 END) AS INTEGER) AS zero_crossings,
        |       CAST(sum(v * v) AS BIGINT) AS energy,
        |       CAST(max(abs(v)) AS BIGINT) AS peak
        |FROM lagged GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      import graft.multimodal.Multimodal
      import s.implicits._
      Multimodal.asMedia(s, Tables.documents(s, d))
        .filter(_.media_type == "audio")
        .mapPartitions { rows =>
          rows.grouped(64).flatMap { batch =>
            val dec = Multimodal.JdkCodec.decodeBatch(batch.map(_.payload))
            batch.lazyZip(dec).map { (r, dd) =>
              // invert the codec's [0,1] shift back to exact 16-bit ints
              val v = dd.pixels.map(p => math.round(p * 65536f - 32768f))
              var zc = 0
              var energy = 0L
              var peak = 0L
              var i = 0
              while (i < v.length) {
                energy += v(i).toLong * v(i)
                val a = math.abs(v(i).toLong)
                if (a > peak) peak = a
                if (i > 0 && ((v(i) >= 0) != (v(i - 1) >= 0))) zc += 1
                i += 1
              }
              (r.doc_id, v.length, zc, energy, peak)
            }
          }
        }
        .toDF("doc_id", "n_samples", "zero_crossings", "energy", "peak")
        .orderBy("doc_id")
    },

    // ----- ORACLED image decode, same discipline as the audio query:
    // Spark decodes the real PNG via ImageIO and recovers the 8-bit
    // grayscale values from the BT.601 luma EXACTLY (r=g=b, so
    // luma·255 ≈ v within ~1e-4 — round() restores the integer for
    // every v in 0..255, verified exhaustively); DuckDB replays the
    // pixel LCG (seed = doc_id, top-of-2^40 byte). Integer features
    // only — the full encode→decode→recover chain is hash-compared.
    Q(
      "multimodal_image_features",
      """WITH RECURSIVE img AS (
        |  SELECT doc_id,
        |         CAST((6 + doc_id % 4) * (5 + (doc_id // 4) % 4) AS INTEGER) AS n
        |  FROM documents WHERE doc_id % 3 = 0),
        |seq AS (
        |  SELECT doc_id, n, 1 AS i,
        |         (CAST(doc_id AS HUGEINT) * 6364136223846793005 + 1442695040888963407)
        |           % 18446744073709551616 AS u
        |  FROM img
        |  UNION ALL
        |  SELECT doc_id, n, i + 1,
        |         (u * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
        |  FROM seq WHERE i < n),
        |px AS (SELECT doc_id, CAST((u // 1099511627776) % 256 AS INTEGER) AS v FROM seq)
        |SELECT doc_id,
        |       CAST(count(*) AS INTEGER) AS n_pixels,
        |       CAST(sum(v) AS BIGINT) AS sum_v,
        |       CAST(min(v) AS INTEGER) AS min_v,
        |       CAST(max(v) AS INTEGER) AS max_v,
        |       CAST(sum(CASE WHEN v < 128 THEN 1 ELSE 0 END) AS INTEGER) AS dark
        |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      import graft.multimodal.Multimodal
      import s.implicits._
      Multimodal.asMedia(s, Tables.documents(s, d))
        .filter(_.media_type == "image")
        .mapPartitions { rows =>
          rows.grouped(64).flatMap { batch =>
            val dec = Multimodal.JdkCodec.decodeBatch(batch.map(_.payload))
            batch.lazyZip(dec).map { (r, dd) =>
              val v = dd.pixels.map(p => math.round(p.toDouble * 255.0).toInt)
              (r.doc_id, v.length, v.map(_.toLong).sum, v.min, v.max, v.count(_ < 128))
            }
          }
        }
        .toDF("doc_id", "n_pixels", "sum_v", "min_v", "max_v", "dark")
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
