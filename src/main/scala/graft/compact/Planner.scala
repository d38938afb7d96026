package graft.compact

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Metadata-plane planning: turns a file listing into `LeafPlan`s using
  * only declarative Spark expressions, so planning itself distributes
  * (the reference plans in pure driver Python — SURVEY.md §2.1 O3-O6).
  *
  * Selection rules replicated (each cites the reference):
  *   - size candidates: `size < targetFileBytes` (parquet_compactor.py:111-113)
  *   - volatile-partition skip: leaf containing `year=<now>` AND
  *     `month=<now>` AND a provider in skip list (:246-260)
  *   - basename from `source=` token, fallback "data" (:236-244)
  *   - compacted-name classification `{stem}_{32hex}.parquet` (uuid
  *     outputs) / `{stem}_{digits}.parquet` (legacy) (:279-281; the
  *     reference's unescaped `.` bug is NOT replicated, SURVEY.md §7.6.8)
  *   - newest compacted file re-included so the tail keeps growing
  *     (:264-292); new files only when older than the freshness window
  *     (:275, :286-289); groups need >=2 files (:316-317)
  *   - GCP leaves group by `(invoice_month, date)` extracted from file
  *     names by *equality* — not the reference's substring containment
  *     hazard (:191-193, SURVEY.md §7.6.8)
  *
  * Staging debris from interrupted runs (`.staging-*`) is never a
  * candidate.
  */
object Planner {

  private val hexSuffix = "_[0-9a-f]{32}\\.parquet$"
  private val numSuffix = "_[0-9]+\\.parquet$"
  // bucketed-layout outputs keep a 5-digit bucket tag after the hex
  // (Merger.bucketTagOf) — compacted all the same
  private val bucketSuffix = "_[0-9a-f]{32}_[0-9]{5}\\.parquet$"

  def plan(spark: SparkSession, files: Dataset[FileMeta], cfg: CompactorConfig): Seq[LeafPlan] = {
    import spark.implicits._
    planned(spark, files, cfg).as[LeafPlan].collect().toSeq.sortBy(p => (p.leaf, p.stem))
  }

  /** The plan as a DataFrame(leaf, stem, files, totalBytes) — collect()
    * happens only on this (small: one row per output group) result.
    */
  def planned(spark: SparkSession, files: Dataset[FileMeta], cfg: CompactorConfig): DataFrame = {
    val asOf = cfg.asOfDate
    val curYear = s"year=${asOf.getYear}"
    val curMonth = f"month=${asOf.getMonthValue}%02d"
    val cutoffEpochDay = asOf.minusDays(cfg.freshnessDays.toLong).toEpochDay

    val inVolatile =
      cfg.skipProvidersCurrentMonth
        .map(p => col("leaf").contains(p))
        .reduceOption(_ || _)
        .getOrElse(lit(false)) &&
        col("leaf").contains(curYear) && col("leaf").contains(curMonth)

    val base = files.toDF
      .where(col("path").endsWith(".parquet")) // never markers (_SUCCESS) or stray junk
      .where(!col("path").contains("/.staging-"))
      // manifest-mode outputs live under hidden .data-* dirs and are
      // resolved via their manifest (ManifestCommit.liveFiles); planning
      // them as rename-mode inputs would move them out from under it
      .where(!col("path").contains("/.data-"))
      .where(col("size") < cfg.targetFileBytes)
      .withColumn("leaf", regexp_replace(col("path"), "/[^/]*$", ""))
      .where(!inVolatile)
      .withColumn("fname", substring_index(col("path"), "/", -1))
      .withColumn("isGcp", col("leaf").contains("GCP"))
      .withColumn(
        "basename",
        coalesce(
          when(regexp_extract(col("leaf"), "source=([^/]+)", 1) === "", null)
            .otherwise(regexp_extract(col("leaf"), "source=([^/]+)", 1)),
          lit("data"),
        ),
      )
      // GCP file names carry the partition key: <invoice_month>_<date>_<suffix>.parquet
      .withColumn(
        "stem",
        when(
          col("isGcp"),
          concat_ws("_", split(col("fname"), "_").getItem(0), split(col("fname"), "_").getItem(1)),
        ).otherwise(col("basename")),
      )
      // Adjacency matters: the suffix must follow the stem IMMEDIATELY
      // (`{stem}_{32hex}.parquet`), so capture everything before the
      // suffix and require equality with the stem — plain
      // startsWith+endsWith would misclassify `data_2026_01.parquet`
      // as legacy-compacted and orphan it forever.
      .withColumn(
        "isCompacted",
        regexp_extract(col("fname"), s"^(.*)$hexSuffix", 1) === col("stem") ||
          regexp_extract(col("fname"), s"^(.*)$bucketSuffix", 1) === col("stem") ||
          (!col("isGcp") && regexp_extract(col("fname"), s"^(.*)$numSuffix", 1) === col("stem")),
      )
      // Freshness compares UTC epoch days, independent of the session
      // time zone (the reference pins utcnow on both sides,
      // parquet_compactor.py:275).
      .withColumn(
        "staleNew",
        !col("isCompacted") && (col("mtimeMs") / lit(86400000L)).cast("long") < lit(cutoffEpochDay),
      )

    // Newest compacted file per group is re-included at the head so the
    // (probably under-sized) tail file keeps absorbing rows. Computed as
    // a window max over the same (leaf, stem) key the final groupBy
    // uses, so the whole plan needs exactly ONE shuffle — the follow-up
    // aggregation reuses the window's hash partitioning.
    val w = Window.partitionBy("leaf", "stem")
    base
      .withColumn(
        "newestCompacted",
        max(when(col("isCompacted"), struct(col("mtimeMs"), col("path")))).over(w).getField("path"),
      )
      .where(col("staleNew") || col("path") === col("newestCompacted"))
      .groupBy("leaf", "stem")
      .agg(
        sort_array(collect_list(col("path"))).as("files"),
        sum(col("size")).as("totalBytes"),
      )
      .where(size(col("files")) >= 2)
      .select("leaf", "stem", "files", "totalBytes")
  }
}
