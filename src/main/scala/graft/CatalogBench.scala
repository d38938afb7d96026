package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.compact.CatalogCommit

/** Catalog snapshot-format ladder: prices publish / current / oldestPin
  * / oldestPins at 10²–10⁵ member leaves, inline vs two-level
  * grouped — the r17 verdict's "bound the snapshot format" done
  * criterion: steady-state GROUPED publish cost must follow TOUCHED
  * leaves (flat across the ladder), while inline publish cost follows
  * total members.
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
