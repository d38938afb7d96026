package graft

import java.net.URI
import java.nio.file.Files

import org.apache.hadoop.fs.{FileStatus, FSDataInputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.sql.SparkSession

import graft.compact.CatalogCommit

/** A local scheme with injected per-create/per-open latency — the
  * object-store shape (each PUT/GET is a 10–50 ms round trip) for the
  * migration rung, where the knob under measurement is the PUT fan-out
  * width, not local-fs syscall cost. The lag sits on
  * `createOutputStreamWithMode` — the ONE protected hook every
  * RawLocalFileSystem create overload funnels into (the public
  * variants both delegate to a private 8-arg create, so overriding
  * them would miss or double-charge) — charging each create exactly
  * once. Statuses are eagerized like the spec schemes
  * (RawLocalFileSystem loads permissions lazily via java.io.File,
  * which rejects non-`file` schemes).
  */
class SlowCatFs extends RawLocalFileSystem {
  override def getScheme: String = "slowcat"
  override def getUri: URI = URI.create("slowcat:///")
  private def eager(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    "graft", "graft", st.getPath,
  )
  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(eager)
  private def lag(): Unit = {
    val ms = SlowCatFs.latencyMs
    if (ms > 0L) Thread.sleep(ms)
  }
  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean, permission: FsPermission,
  ): java.io.OutputStream = {
    lag()
    super.createOutputStreamWithMode(f, append, permission)
  }
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    lag()
    super.open(f, bufferSize)
  }
}
object SlowCatFs {
  @volatile var latencyMs: Long = 0L
}

/** Catalog snapshot-format ladder: prices publish / current / oldestPin
  * / oldestPins at 10²–10⁵ member leaves by default — and an opt-in
  * 10⁶ rung via SPARK_GRAFT_CATALOG_MAX_MEMBERS=1000000 (the ROADMAP
  * 119 gate point, ~2 min extra) — inline vs two-level grouped: the
  * r17 verdict's "bound the snapshot format" done criterion:
  * steady-state GROUPED publish cost must follow TOUCHED leaves (flat
  * across the ladder), while inline publish cost follows total
  * members.
  *
  * SPARK_GRAFT_CATALOG_LAT_MS=<ms> switches to the LATENCY mode
  * instead: the migration-shaped publish (inline → grouped, G≈√members
  * manifest PUTs) runs against a local scheme that injects that much
  * latency into every create — the object-store shape — once at pool
  * width 1 and once at the configured width (GRAFT_CATALOG_POOL,
  * default 8), showing the pooled fan-out's ~pool× win (r19
  * prescription 2).
  *
  * Pins are synthetic (the catalog never dereferences a pin at publish
  * or resolve time — leaf reads are priced elsewhere), so the ladder
  * isolates exactly the driver-side snapshot I/O the weak-component
  * finding was about.
  *
  * Run: sbt "runMain graft.CatalogBench"
  */
object CatalogBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = Files.createTempDirectory("catalog-bench").toFile
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    try {
      // warm the JVM + fs paths so the first rung isn't charged startup
      CatalogCommit.publish(
        spark, new java.io.File(root, "warm").getAbsolutePath, Map("w" -> 1L), groups = Some(2))
      val steadyTouches = 20
      // SPARK_GRAFT_CATALOG_MAX_MEMBERS=1000000 adds the 10⁶ rung (the
      // ROADMAP 119 gate measurement — ~2 min extra, so opt-in); the
      // default ladder stops at 10⁵ like the r18 table.
      val maxMembers = sys.env.get("SPARK_GRAFT_CATALOG_MAX_MEMBERS").map { v =>
        v.toIntOption.getOrElse(throw new IllegalArgumentException(
          s"SPARK_GRAFT_CATALOG_MAX_MEMBERS must be a plain integer (e.g. 1000000), got '$v'"))
      }.getOrElse(100000)

      // LATENCY mode (r19 prescription 2): price the inline→grouped
      // migration's G-manifest PUT burst under object-store-shaped
      // per-PUT latency, serial (pool 1) vs the pooled width — the
      // fan-out's win is invisible on a local fs where a PUT is µs.
      sys.env.get("SPARK_GRAFT_CATALOG_LAT_MS").map { v =>
        v.toLongOption.filter(_ > 0).getOrElse(throw new IllegalArgumentException(
          s"SPARK_GRAFT_CATALOG_LAT_MS must be a positive integer of milliseconds, got '$v'"))
      } match {
        case Some(lat) =>
          spark.sparkContext.hadoopConfiguration
            .set("fs.slowcat.impl", classOf[SlowCatFs].getName)
          val members = maxMembers
          val g = math.ceil(math.sqrt(members.toDouble)).toInt
          val leaves = (0 until members).map(i => f"leaf-$i%05d")
          val pooledWidth = sys.env.get("GRAFT_CATALOG_POOL").flatMap(_.toIntOption).getOrElse(8)
          for (width <- Seq(1, pooledWidth)) {
            sys.props("graft.catalog.pool") = width.toString
            try {
              val dir = new java.io.File(root, s"lat-$width"); dir.mkdirs()
              val cat = s"slowcat:${dir.getAbsolutePath}"
              // seed latency-free: the inline seed is ONE root PUT — not
              // the term under measurement
              SlowCatFs.latencyMs = 0L
              CatalogCommit.publish(spark, cat, leaves.map(_ -> 1L).toMap)
              SlowCatFs.latencyMs = lat
              val t0 = System.nanoTime()
              CatalogCommit.publish(spark, cat, Map(leaves.head -> 2L), groups = Some(g))
              val migMs = ms(t0)
              // the steady shapes under the same latency — a single-
              // touch publish (root parse + 1 group parse + 1 group
              // write + root create ≈ 4 round trips regardless of N)
              // and a single-leaf pin read (root + ONE group GET):
              // these must stay FLAT in lat multiples while only the
              // migration scales with G
              val t1 = System.nanoTime()
              CatalogCommit.publish(spark, cat, Map(leaves.head -> 3L))
              val steadyMs = ms(t1)
              val t2 = System.nanoTime()
              val snap = CatalogCommit.current(spark, cat).get
              require(snap.pin(leaves(1)).contains(1L))
              val pinMs = ms(t2)
              def n(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
              println(
                s"""{"metric":"catalog_migration_latency","members":$members,"groups":$g,""" +
                  s""""put_latency_ms":$lat,"pool":$width,"migration_ms":${n(migMs)},""" +
                  s""""steady_publish_ms":${n(steadyMs)},"pin_read_ms":${n(pinMs)}}""")
            } finally {
              SlowCatFs.latencyMs = 0L
              sys.props -= "graft.catalog.pool"
            }
          }
          return
        case None => ()
      }

      val rungs = Seq(100, 1000, 10000, 100000, 1000000).filter(_ <= maxMembers)
      for (members <- rungs; grouped <- Seq(false, true)) {
        val g = math.ceil(math.sqrt(members.toDouble)).toInt
        val fmt = if (grouped) s"grouped($g)" else "inline"
        val cat = new java.io.File(root, s"cat-$members-$grouped").getAbsolutePath
        val leaves = (0 until members).map(i => f"leaf-$i%05d")
        val groups = if (grouped) Some(g) else None

        // seed: ONE publish pinning every member (for grouped this is
        // the migration-shaped full split — the one O(members) publish)
        val t0 = System.nanoTime()
        CatalogCommit.publish(spark, cat, leaves.map(_ -> 1L).toMap, groups = groups)
        val seedMs = ms(t0)

        // steady state: single-leaf publishes (the per-run shape — a
        // compaction run touches few leaves of a big catalog)
        val t1 = System.nanoTime()
        (1 to steadyTouches).foreach { k =>
          CatalogCommit.publish(spark, cat, Map(leaves(k % members) -> (1L + k)))
        }
        val steadyMs = ms(t1) / steadyTouches

        // resolve costs over the now keep=21-deep snapshot history
        val t2 = System.nanoTime()
        val cur = CatalogCommit.current(spark, cat).get
        val rootOnlyMs = ms(t2) // lazy: root parse only
        val t3 = System.nanoTime()
        require(cur.leaves.size == members)
        val resolveMs = ms(t3) // forcing the full pin map
        val t4 = System.nanoTime()
        val op = CatalogCommit.oldestPin(spark, cat, leaves(1))
        val oldestPinMs = ms(t4)
        require(op.contains(1L), s"oldestPin drifted: $op")
        val t5 = System.nanoTime()
        val pins = CatalogCommit.oldestPins(spark, cat)
        val oldestPinsMs = ms(t5)
        require(pins.size == members)

        // Locale.ROOT: default-locale %f can emit comma decimals — the
        // one line that must parse as JSON (same discipline as Bench)
        def n(v: Double) = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
        println(
          s"""{"metric":"catalog_ladder","members":$members,"format":"$fmt",""" +
            s""""seed_publish_ms":${n(seedMs)},""" +
            s""""steady_publish_ms":${n(steadyMs)},""" +
            s""""current_root_ms":${n(rootOnlyMs)},""" +
            s""""resolve_full_ms":${n(resolveMs)},""" +
            s""""oldest_pin_ms":${n(oldestPinMs)},""" +
            s""""oldest_pins_ms":${n(oldestPinsMs)}}""")
      }
    } finally {
      Fs.rmTree(root)
      spark.stop()
    }
  }
}
