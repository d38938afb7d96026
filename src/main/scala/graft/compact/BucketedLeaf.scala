package graft.compact

import org.apache.spark.sql.SparkSession

/** Catalog face of the bucketed output layout
  * (`CompactorConfig.bucketKey`): Spark resolves bucketing from CATALOG
  * metadata, not from files, so a compacted-bucketed leaf joins
  * shuffle-free only when read through a table that declares the
  * layout. This registers that table.
  *
  * Contract: the leaf was compacted under rename mode with
  * `bucketKey = Some(key)`, `bucketCount = n`, and holds ONLY bucketed
  * outputs (`{stem}_{32hex}_{NNNNN}.parquet` — a raw arrival without a
  * bucket tag fails the reader's name→bucket parse). Re-register after
  * each compaction cycle if new arrivals landed in between; manifest
  * leaves resolve their live set by manifest subtraction, which a
  * location-based catalog table cannot express — bucketed layout is a
  * rename-mode feature by design.
  *
  * Two leaves registered with the same (key, n) sort-merge join with
  * ZERO Exchange nodes (BucketedCompactionSpec pins the plan) — at
  * 100 TB this converts every fact-to-fact join on the bucket key from
  * a full-data shuffle into a per-bucket local merge, the same
  * economics as [[graft.operators.ZOrder]] for scans but applied to
  * join placement.
  */
object BucketedLeaf {

  /** Create (replace) an external bucketed table named `table` over
    * `leaf`. Schema is inferred from the leaf's parquet once, at
    * registration.
    */
  def register(spark: SparkSession, table: String, leaf: String, key: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive: $nBuckets")
    val schema = spark.read.parquet(leaf).schema
    require(schema.fieldNames.contains(key), s"bucket key '$key' not in leaf schema ${schema.fieldNames.mkString(",")}")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    spark.sql(
      s"CREATE TABLE `$table` (${schema.toDDL}) USING parquet " +
        s"CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $nBuckets BUCKETS " +
        s"LOCATION '$leaf'",
    )
    ()
  }
}
