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
