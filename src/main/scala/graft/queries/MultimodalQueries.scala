package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing demo: treat a payload as an opaque `binary`
  * column with typed metadata. The fixture tables carry no real media, so
  * the payload is the UTF-8 encoding of `text`; the full decode /
  * feature-extract path (with the stubbed codec) lives in
  * `graft.multimodal.Multimodal` and its spec.
  */
object MultimodalQueries {

  val qs: Seq[Q] = Seq(
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
