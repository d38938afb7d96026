package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted LSH bands for INCREMENTAL cross-corpus dedup.
  *
  * `dedup_minhash_cross` demonstrates the query shape (new batch × old
  * corpus, band join only across sides) but re-derives both sides' band
  * signatures per run. The production shape at 100 TB persists the
  * history side once: a parquet table of `(doc_id, band, sig)` rows —
  * the output of the shared MinHash kernel
  * ([[graft.queries.DedupQueries.minhashBands]]) — that each ingest
  * batch appends to after screening against it. Per batch the work is
  * then proportional to the BATCH (its own shingle→minhash pipeline +
  * one band join against the store), never to the corpus: history text
  * is not re-read, not re-shingled, not re-hashed.
  *
  * The store is partitioned by `band` (16/rowsPerBand values): the
  * screen join's scan prunes to matching band partitions, and a band
  * join shuffles only `(sig)` equality groups. Appends are new files in
  * existing band partitions — no rewrite of history.
  */
object BandsStore {

  /** Build (overwrite) the bands store from a (doc_id, text) corpus. */
  def build(spark: SparkSession, docs: DataFrame, path: String, rowsPerBand: Int = 4): Unit =
    graft.queries.DedupQueries.minhashBands(spark, docs, rowsPerBand)
      .write.mode("overwrite").partitionBy("band").parquet(path)

  /** Append a new batch's bands — call AFTER screening the batch, so the
    * batch never pairs with itself through the store.
    */
  def append(spark: SparkSession, newDocs: DataFrame, path: String, rowsPerBand: Int = 4): Unit =
    graft.queries.DedupQueries.minhashBands(spark, newDocs, rowsPerBand)
      .write.mode("append").partitionBy("band").parquet(path)

  /** Candidate near-duplicate pairs of a NEW batch against the persisted
    * history: (new_doc, old_doc), distinct. Only the batch side runs the
    * shingle→minhash pipeline; the history side is a parquet scan of the
    * store. Exact verification (Jaccard/containment on the candidate
    * pairs) stays the caller's next step, same as every LSH path here.
    */
  def screen(spark: SparkSession, newDocs: DataFrame, path: String, rowsPerBand: Int = 4): DataFrame = {
    val newBands = graft.queries.DedupQueries.minhashBands(spark, newDocs, rowsPerBand)
    val hist = spark.read.parquet(path)
    newBands.as("x")
      .join(hist.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("old_doc"))
      .distinct()
  }
}
