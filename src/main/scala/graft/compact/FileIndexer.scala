package graft.compact

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Dataset, SparkSession}

/** Recursive file listing as a distributed Dataset.
  *
  * The reference recurses over S3 `CommonPrefixes` one prefix at a time
  * on a single thread (parquet_compactor.py:80-99) — O(#prefixes)
  * sequential round-trips, the first thing that dies at 100 TB
  * (SURVEY.md §7.2 M4). Here the driver lists only the first level;
  * each first-level prefix is then listed recursively *inside a Spark
  * task*, so listing parallelism scales with the cluster, and the
  * result stays a Dataset (never a driver-side list of millions).
  */
object FileIndexer {

  def list(spark: SparkSession, root: String): Dataset[FileMeta] = {
    import spark.implicits._
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)

    val status = fs.listStatus(rootPath)
    val topDirs = status.filter(_.isDirectory).map(_.getPath.toString)
    val topFiles = status
      .filter(_.isFile)
      .map(f => FileMeta(f.getPath.toString, f.getLen, f.getModificationTime))
      .toSeq

    // Hadoop Configuration is not serializable — ship its entries.
    val confEntries =
      hconf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq

    val listed: Dataset[FileMeta] =
      if (topDirs.isEmpty) spark.emptyDataset[FileMeta]
      else
        spark.sparkContext
          .parallelize(topDirs.toSeq, math.min(topDirs.length, 64))
          .mapPartitions { dirs =>
            val conf = new Configuration(false)
            confEntries.foreach { case (k, v) => conf.set(k, v) }
            dirs.flatMap { dir =>
              val p = new Path(dir)
              val dfs = p.getFileSystem(conf)
              val it = dfs.listFiles(p, true)
              val buf = scala.collection.mutable.ArrayBuffer.empty[FileMeta]
              while (it.hasNext) {
                val f = it.next()
                buf += FileMeta(f.getPath.toString, f.getLen, f.getModificationTime)
              }
              buf
            }
          }
          .toDS()

    if (topFiles.isEmpty) listed else listed.union(topFiles.toDS())
  }

  /** FileSystem for a path with the session's Hadoop conf. */
  def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
