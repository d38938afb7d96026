package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental inverted-index store for BM25 retrieval — the
  * [[BandsStore]]/[[IvfStore]] screen-and-absorb discipline applied to
  * the search family. A training pipeline's corpus search (dedup
  * triage, contamination forensics) cannot re-derive per-doc term
  * frequencies from 100 TB of text per query; the store persists the
  * postings ONCE and each probe reads only the query terms' hash
  * buckets.
  *
  * Layout at `path` — a manifest-lite ADD-LOG, sealed per generation:
  *
  *   - `add-<seq>/tb=<b>/` — one append batch's postings
  *     `(word, doc_id, tf)`, hive-partitioned by the term's hash
  *     bucket (xxhash64 % [[Buckets]]) so a probe is a static
  *     partition filter;
  *   - `dl-<seq>/` — that batch's `(doc_id, dl)` document lengths;
  *   - `stats-<seq>` — CUMULATIVE corpus stats (n docs, Σdl) as of the
  *     generation — one tiny file, read whole per probe;
  *   - `_current-<seq>` — empty pointer, CREATED LAST. A crashed
  *     build/append leaves unsealed dirs a reader never resolves and
  *     the next writer's seq reuses-or-supersedes; the same
  *     create-only pointer contract every sibling store keeps.
  *
  * Probes compute BM25 from (tf, dl) + the current stats at QUERY
  * time, so scores reflect the corpus as of the sealed generation —
  * append moves n/avgdl/df and thereby every score, exactly like the
  * from-scratch query. [[IndexStoreSpec]] pins probe ≡ one-shot
  * [[graft.queries.SearchQueries.bm25]] bit-for-bit (same expression
  * tree, same integer inputs) after builds, appends, and compaction.
  *
  * Contract: `append` batches carry NEW doc_ids (the ingest pipeline
  * dedups upstream — re-appending a doc would double its postings, the
  * same at-least-once caveat BandsStore documents). `compact` folds
  * append debris offline, like the sibling stores' compaction.
  */
object IndexStore {

  /** Term-hash partitions per generation. 16 keeps fixture dirs small;
    * at corpus scale this is a dial — probes read |query-term buckets|
    * partitions per generation regardless of corpus size.
    */
  val Buckets = 16

  private val PtrRe = "_current-(\\d+)".r

  private def fsOf(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Newest sealed generation, if any. */
  def currentSeq(spark: SparkSession, path: String): Option[Long] = {
    val fs = fsOf(spark, path)
    val base = new Path(path)
    if (!fs.exists(base)) None
    else fs.listStatus(base)
      .flatMap(e => PtrRe.findFirstMatchIn(e.getPath.getName).map(_.group(1).toLong))
      .sorted.lastOption
  }

  /** The bucket the Spark-side `pmod(xxhash64(word), Buckets)` assigns
    * — computed driver-side for the probe's static partition filter
    * (xxhash64's SQL seed is 42).
    */
  private[graft] def bucketOf(term: String): Long = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(term),
      org.apache.spark.sql.types.StringType, 42L,
    )
    ((h % Buckets) + Buckets) % Buckets
  }

  private def readStats(spark: SparkSession, path: String, seq: Long): (Long, Long) = {
    val fs = fsOf(spark, path)
    val in = fs.open(new Path(s"$path/stats-$seq"))
    val text = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val Array(n, s) = text.trim.split(" ")
    (n.toLong, s.toLong)
  }

  private def writeGeneration(
      spark: SparkSession,
      docs: DataFrame,
      path: String,
      seq: Long,
      prevStats: (Long, Long),
  ): Long = {
    val fs = fsOf(spark, path)
    val words = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    words.groupBy("doc_id", "word")
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", pmod(xxhash64(col("word")), lit(Buckets)))
      .write.partitionBy("tb").mode("overwrite").parquet(s"$path/add-$seq")
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).as("dl"))
    dl.write.mode("overwrite").parquet(s"$path/dl-$seq")
    val batch = dl.agg(count(lit(1)), sum(col("dl"))).head
    val (n, s) = (prevStats._1 + batch.getLong(0), prevStats._2 + batch.getLong(1))
    val out = fs.create(new Path(s"$path/stats-$seq"), true)
    try out.write(s"$n $s".getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    fs.create(new Path(s"$path/_current-$seq"), false).close()
    seq
  }

  /** Build a fresh index over `docs` (seq 1). */
  def build(spark: SparkSession, docs: DataFrame, path: String): Long = {
    require(currentSeq(spark, path).isEmpty, s"index already sealed at $path — use append")
    writeGeneration(spark, docs, path, 1L, (0L, 0L))
  }

  /** Append a batch of NEW documents as the next sealed generation —
    * work proportional to the batch; no existing generation is read or
    * rewritten (the add-log trick: deletes don't exist in an ingest
    * index, so arrival-only generations compose by union).
    */
  def append(spark: SparkSession, docs: DataFrame, path: String): Long = {
    val cur = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed index at $path — build first"))
    writeGeneration(spark, docs, path, cur + 1L, readStats(spark, path, cur))
  }

  private def dirsOf(spark: SparkSession, path: String, seq: Long, prefix: String): Seq[String] = {
    val fs = fsOf(spark, path)
    (1L to seq).map(i => s"$path/$prefix-$i").filter(p => fs.exists(new Path(p)))
  }

  private def addDirs(spark: SparkSession, path: String, seq: Long): Seq[String] =
    dirsOf(spark, path, seq, "add")

  /** Live generation count — [[StoreMaintenance.maintainIndex]]'s
    * compaction dial (probe fan-out is one scan per generation).
    */
  def generationCount(spark: SparkSession, path: String): Int =
    currentSeq(spark, path).map(addDirs(spark, path, _).size).getOrElse(0)

  /** BM25 over the sealed index for `terms`: reads ONLY the terms'
    * `tb=` partitions of each generation (static partition filter),
    * derives per-term df from the probed postings (complete per term
    * by construction), and scores with the exact expression tree of
    * the one-shot [[graft.queries.SearchQueries.bm25]] — byte-equal
    * results on the same corpus.
    */
  def search(
      spark: SparkSession,
      path: String,
      terms: Seq[String],
      withDl: Boolean = false, // keep the doc-length column (rerank stages need it)
  ): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val seq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed index at $path"))
    val (nDocs, sumDl) = readStats(spark, path, seq)
    val tbs = terms.map(bucketOf).distinct
    val postings = addDirs(spark, path, seq)
      .map(p => spark.read.parquet(p).where(col("tb").isin(tbs: _*)))
      .reduce(_ unionByName _)
      .where(col("word").isin(terms: _*))
    val n = terms.size
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      coalesce(sum(when(col("word") === t, col("tf"))), lit(0L)).as(s"tf${i + 1}")
    }
    val cand = postings.groupBy("doc_id").agg(tfCols.head, tfCols.tail: _*)
    val dl = dirsOf(spark, path, seq, "dl")
      .map(p => spark.read.parquet(p))
      .reduce(_ unionByName _)
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      count(when(col("word") === t, 1)).cast("double").as(s"df${i + 1}")
    }
    val g = postings.agg(dfCols.head, dfCols.tail: _*)
      .withColumn("n", lit(nDocs).cast("double"))
      .withColumn("avgdl", lit(sumDl).cast("double") / lit(nDocs).cast("double"))
    val score = (1 to n)
      .map(i => expr(graft.queries.SearchQueries.contribSql(s"tf$i", s"df$i")))
      .reduce(_ + _)
    val outCols = (col("doc_id") +:
      (1 to n).map(i => col(s"tf$i").cast("int").as(s"tf$i")) :+
      round(score, 6).as("bm25")) ++ (if (withDl) Seq(col("dl")) else Seq.empty)
    cand.join(dl, "doc_id")
      .crossJoin(broadcast(g))
      .select(outCols: _*)
      .orderBy(desc("bm25"), col("doc_id"))
  }

  /** Fold every generation's postings/lengths into ONE new sealed
    * generation (probe cost returns to one dir per bucket after many
    * appends), then reclaim the superseded dirs. Offline-only, like
    * the sibling stores' compaction: readers mid-probe on the old
    * generations lose their dirs at the reclaim.
    */
  def compact(spark: SparkSession, path: String): Long = {
    val seq = currentSeq(spark, path)
      .getOrElse(throw new IllegalStateException(s"no sealed index at $path"))
    if (addDirs(spark, path, seq).size <= 1) return seq
    val fs = fsOf(spark, path)
    val next = seq + 1L
    addDirs(spark, path, seq)
      .map(p => spark.read.parquet(p))
      .reduce(_ unionByName _)
      .write.partitionBy("tb").mode("overwrite").parquet(s"$path/add-$next")
    dirsOf(spark, path, seq, "dl")
      .map(p => spark.read.parquet(p))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$path/dl-$next")
    val (nDocs, sumDl) = readStats(spark, path, seq)
    val out = fs.create(new Path(s"$path/stats-$next"), true)
    try out.write(s"$nDocs $sumDl".getBytes(java.nio.charset.StandardCharsets.UTF_8)) finally out.close()
    fs.create(new Path(s"$path/_current-$next"), false).close()
    (1L to seq).foreach { i =>
      Seq(s"add-$i", s"dl-$i", s"stats-$i", s"_current-$i").foreach { ndir =>
        try { fs.delete(new Path(s"$path/$ndir"), true); () } catch { case _: Throwable => () }
      }
    }
    next
  }
}
