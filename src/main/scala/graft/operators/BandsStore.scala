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

  /** Second-level partition: a stable hash bucket of the signature —
    * the scan-pruning dial for stores that outgrow one machine's scan
    * bandwidth (the term the StreamBench seeded probe isolates). Must
    * be identical at build/append/screen time; crc32 is stable across
    * JVMs and Spark versions (unlike hash(), whose seed is an
    * implementation detail).
    */
  private def sigBucket(nBuckets: Int) =
    pmod(crc32(col("sig").cast("binary")), lit(nBuckets.toLong)).cast("int").as("sigb")

  /** Build (overwrite) the bands store from a (doc_id, text) corpus.
    * `sigBuckets` > 1 adds the sig-hash partition level under `band`.
    */
  def build(spark: SparkSession, docs: DataFrame, path: String, rowsPerBand: Int = 4, sigBuckets: Int = 1): Unit = {
    val bands = graft.queries.DedupQueries.minhashBands(spark, docs, rowsPerBand)
    if (sigBuckets <= 1) bands.write.mode("overwrite").partitionBy("band").parquet(path)
    else bands.withColumn("sigb", sigBucket(sigBuckets))
      .write.mode("overwrite").partitionBy("band", "sigb").parquet(path)
  }

  /** Append a new batch's bands — call AFTER screening the batch, so the
    * batch never pairs with itself through the store.
    */
  def append(spark: SparkSession, newDocs: DataFrame, path: String, rowsPerBand: Int = 4, sigBuckets: Int = 1): Unit = {
    val bands = graft.queries.DedupQueries.minhashBands(spark, newDocs, rowsPerBand)
    if (sigBuckets <= 1) bands.write.mode("append").partitionBy("band").parquet(path)
    else bands.withColumn("sigb", sigBucket(sigBuckets))
      .write.mode("append").partitionBy("band", "sigb").parquet(path)
  }

  /** Candidate near-duplicate pairs of a NEW batch against the persisted
    * history: (new_doc, old_doc), distinct. Only the batch side runs the
    * shingle→minhash pipeline; the history side is a parquet scan of the
    * store. Exact verification (Jaccard/containment on the candidate
    * pairs) stays the caller's next step, same as every LSH path here.
    *
    * With `sigBuckets` matching the store's, the batch's observed
    * (band, sigb) combinations become a STATIC partition filter on the
    * history scan — a small batch touches a few buckets and the screen
    * reads only those directories, the pruning that matters once the
    * store's band partitions outgrow scan bandwidth. (The combo list is
    * collected driver-side; it is bounded by nBands·sigBuckets, not by
    * batch size.) Joining on sigb as well keeps the shuffle narrower;
    * candidates are unchanged because sigb is a function of sig.
    */
  def screen(spark: SparkSession, newDocs: DataFrame, path: String, rowsPerBand: Int = 4, sigBuckets: Int = 1): DataFrame = {
    val newBands = graft.queries.DedupQueries.minhashBands(spark, newDocs, rowsPerBand)
    // the id inequality is the RE-INGEST guard (the r13 review class,
    // here on the batch surface like DocumentStream.screenAndAbsorbBatch
    // already has): a doc_id already absorbed collides with its own
    // stored rows in every band and would be flagged as a duplicate of
    // itself — inviting a consumer to drop the only copy. Real near-dup
    // pairs always have distinct ids, so the guard never loses one.
    if (sigBuckets <= 1) {
      val hist = spark.read.parquet(path)
      newBands.as("x")
        .join(
          hist.as("y"),
          col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") =!= col("y.doc_id"),
        )
        .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("old_doc"))
        .distinct()
    } else {
      val withB = newBands.withColumn("sigb", sigBucket(sigBuckets))
      val combos = withB.select("band", "sigb").distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      val hist = spark.read.parquet(path)
        .where(concat_ws(":", col("band"), col("sigb"))
          .isin(combos.map { case (b, s) => s"$b:$s" }.toSeq: _*))
      withB.as("x")
        .join(
          hist.as("y"),
          col("x.band") === col("y.band") && col("x.sigb") === col("y.sigb") &&
            col("x.sig") === col("y.sig") && col("x.doc_id") =!= col("y.doc_id"),
        )
        .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("old_doc"))
        .distinct()
    }
  }

  /** Fold append debris into one file per partition (the
    * [[IvfStore.compactLists]] move for the bands store): every
    * [[append]] adds one small file to each touched `band(/sigb)`
    * directory, so a long-lived store degrades into the small-files
    * problem the table compactor exists for. Rows are rewritten
    * UNCHANGED; `repartition` on the partition columns puts each
    * partition in one task → one file per directory.
    *
    * The store is written in place (no version dirs), so the fold
    * stages the rewrite to a sibling dir, then swaps ONLY the partition
    * directories — hidden sidecars living inside the store path (the
    * `.hs` shingle sets, screen-flags) are untouched. NOT crash-atomic,
    * unlike the IVF store: a crash mid-swap leaves a partial store,
    * which is rebuildable from the corpus (build ≡ append-chain,
    * BandsStoreSpec) — run it offline, the gcOrphans contract.
    */
  def compact(spark: SparkSession, path: String): Unit = {
    val all = spark.read.parquet(path)
    val parts = if (all.columns.contains("sigb")) Seq("band", "sigb") else Seq("band")
    val stage = s"$path.compact-stage"
    all.repartition(parts.map(col): _*)
      .write.mode("overwrite").partitionBy(parts: _*).parquet(stage)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def visibleChildren(p: String) =
      fs.listStatus(new org.apache.hadoop.fs.Path(p)).filter { st =>
        val n = st.getPath.getName
        !n.startsWith(".") && !n.startsWith("_")
      }
    // a false return here means a band is gone with no replacement —
    // fail LOUDLY (the caller rebuilds from the corpus) rather than
    // letting screen() silently stop flagging those bands' near-dups
    visibleChildren(path).foreach { st =>
      if (!fs.delete(st.getPath, true))
        throw new java.io.IOException(s"bands compact: could not delete ${st.getPath} — store needs rebuild")
    }
    visibleChildren(stage).foreach { st =>
      val dest = new org.apache.hadoop.fs.Path(path, st.getPath.getName)
      if (!fs.rename(st.getPath, dest))
        throw new java.io.IOException(s"bands compact: rename ${st.getPath} -> $dest failed — store needs rebuild")
    }
    fs.delete(new org.apache.hadoop.fs.Path(stage), true)
    ()
  }
}
