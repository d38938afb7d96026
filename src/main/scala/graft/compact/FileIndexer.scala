package graft.compact

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Recursive file listing as a distributed Dataset.
  *
  * The reference recurses over S3 `CommonPrefixes` one prefix at a time
  * on a single thread (parquet_compactor.py:80-99) — O(#prefixes)
  * sequential round-trips, the first thing that dies at 100 TB
  * (SURVEY.md §7.2 M4). The driver lists only the first level; each
  * first-level prefix is then listed recursively *inside a Spark task*,
  * so listing parallelism scales with the cluster, and the result stays
  * a Dataset (never a driver-side list of millions).
  */
object FileIndexer {

  def list(spark: SparkSession, root: String): Dataset[FileMeta] = {
    import spark.implicits._
    // Single implementation of the distributed listing: the DataSource
    // V2 connector ([[graft.sources.FileMetaSource]]) — its schema is
    // exactly FileMeta's shape.
    spark.read
      .format("graft.sources.FileMetaSource")
      .load(root)
      .as[FileMeta]
  }

  /** FileSystem for a path with the session's Hadoop conf. */
  def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
