package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector exposing a recursive file listing as a
  * relational table:
  *
  * {{{
  *   spark.read.format("graft.sources.FileMetaSource").load("s3a://bucket/prefix")
  *   // => DataFrame(path STRING, size BIGINT, mtimeMs BIGINT)
  * }}}
  *
  * This is the reference's file-metadata plane (the `(key, size,
  * LastModified)` triples all compaction planning runs on,
  * parquet_compactor.py:101-122) surfaced through the standard
  * connector API, so metadata queries compose with the whole engine.
  * One input partition per first-level directory — listing parallelism
  * scales with the cluster exactly like
  * [[graft.compact.FileIndexer]].
  */
class FileMetaSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = FileMetaSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String],
  ): Table = {
    // DataFrameReader.load(a, b, ...) encodes multiple paths as a JSON
    // array under "paths" — fail with the real reason, not "no path"
    require(
      !properties.containsKey("paths"),
      "FileMetaSource supports a single root: .load(<root>) — union multiple loads instead",
    )
    new FileMetaTable(properties.get("path"))
  }
}

object FileMetaSource {
  val schema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtimeMs", LongType, nullable = false),
  ))
}

class FileMetaTable(root: String) extends Table with SupportsRead {
  require(root != null, "FileMetaSource requires a path: .load(<root>)")
  override def name(): String = s"filemeta($root)"
  override def schema(): StructType = FileMetaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FileMetaScanBuilder(root)
}

class FileMetaScanBuilder(root: String) extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = FileMetaSource.schema
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new FileMetaMicroBatchStream(root, confBroadcast)
  override def description(): String = s"FileMetaScan($root)"

  // Hadoop Configuration is not serializable; broadcast its entries ONCE
  // (one copy per executor) instead of embedding a full copy in every
  // partition — with thousands of first-level prefixes the per-task
  // serialization would otherwise scale with partition count.
  private lazy val confBroadcast: org.apache.spark.broadcast.Broadcast[Array[(String, String)]] = {
    val spark = SparkSession.active
    val entries = spark.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue).toArray
    spark.sparkContext.broadcast(entries)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    val hconf = spark.sparkContext.hadoopConfiguration
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(hconf)
    val status = fs.listStatus(rootPath)
    val dirs = status.filter(_.isDirectory).map(_.getPath.toString)
    // root-level files ride along in the first partition
    val rootFiles = status.filter(_.isFile).map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
    if (dirs.isEmpty) Array(FileMetaPartition(Array.empty, rootFiles))
    else
      dirs.zipWithIndex.map { case (d, i) =>
        FileMetaPartition(Array(d), if (i == 0) rootFiles else Array.empty)
      }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new FileMetaReaderFactory(confBroadcast)
}

final case class FileMetaPartition(
    dirs: Array[String],
    inlineFiles: Array[(String, Long, Long)],
    // mtime window [startMs, endMs) — full range for batch reads; a
    // micro-batch narrows it to "files that appeared since last trigger"
    startMs: Long = 0L,
    endMs: Long = Long.MaxValue,
) extends InputPartition

/** Streaming face of the listing: each trigger emits the files whose
  * mtime falls in `[lastOffset, now - slackMs)` — i.e. "what appeared
  * since the previous micro-batch". Offsets are driver wall-clock
  * timestamps; `slackMs` keeps a safety lag so a storage clock slightly
  * behind the driver can't stamp a file into an already-claimed window
  * (skew beyond the slack means a missed file — the companion
  * compaction trigger tolerates that: the next touching event re-plans
  * the whole leaf). Duplicate delivery on restart (the checkpointed
  * offset re-claims an uncommitted window) is by design at-least-once;
  * downstream planning is idempotent.
  */
class FileMetaMicroBatchStream(
    root: String,
    confBc: org.apache.spark.broadcast.Broadcast[Array[(String, String)]],
    slackMs: Long = 2000L,
) extends MicroBatchStream {

  private case class TimeOffset(ms: Long) extends Offset {
    override def json(): String = ms.toString
  }

  override def initialOffset(): Offset = TimeOffset(0L)
  override def deserializeOffset(json: String): Offset = TimeOffset(json.toLong)
  override def latestOffset(): Offset =
    TimeOffset(math.max(0L, System.currentTimeMillis() - slackMs))
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[TimeOffset].ms, end.asInstanceOf[TimeOffset].ms)
    val spark = SparkSession.active
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return Array.empty
    val status = fs.listStatus(rootPath)
    val dirs = status.filter(_.isDirectory).map(_.getPath.toString)
    val rootFiles = status
      .filter(f => f.isFile && f.getModificationTime >= s && f.getModificationTime < e)
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
    if (dirs.isEmpty) Array(FileMetaPartition(Array.empty, rootFiles, s, e))
    else
      dirs.zipWithIndex.map { case (d, i) =>
        FileMetaPartition(Array(d), if (i == 0) rootFiles else Array.empty, s, e)
      }.toArray[InputPartition]
  }

  override def createReaderFactory(): PartitionReaderFactory = new FileMetaReaderFactory(confBc)
}

class FileMetaReaderFactory(confBc: org.apache.spark.broadcast.Broadcast[Array[(String, String)]])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FileMetaPartition]
    new PartitionReader[InternalRow] {
      private val conf = {
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        c
      }
      private val it: Iterator[(String, Long, Long)] =
        (p.inlineFiles.iterator ++ p.dirs.iterator.flatMap { d =>
          val path = new Path(d)
          val fs = path.getFileSystem(conf)
          // vanish-tolerant: compaction deletes files behind listings
          SafeListing.walk(fs, path)
            .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
        }).filter(f => f._3 >= p.startMs && f._3 < p.endMs)
      private var current: (String, Long, Long) = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current._1), current._2, current._3)
      override def close(): Unit = ()
    }
  }
}
