package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.compact.{CommitMode, CompactorConfig, LeafPlan, ManifestCommit, Merger}

/** Prices the manifest log's metadata plane as commit history grows —
  * the cost the snapshot-pointer head amortizes. One leaf accretes K
  * manifest commits (retainSuperseded, so nothing is pruned); then:
  *
  *   - `resolve_head_ms`: liveFiles through the current head — one
  *     listing + one small read, should be FLAT in K;
  *   - `resolve_scan_ms`: liveFiles with the heads removed — the legacy
  *     full manifest scan, linear in K;
  *   - `last_commit_ms`: wall time of the final mergeAndCommit (its
  *     publish resolves through the head, so it should not grow with K).
  *
  * Run: SPARK_GRAFT_MANIFEST_COMMITS=100 sbt "runMain graft.ManifestBench"
  */
object ManifestBench {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_MANIFEST_COMMITS", "100").toInt
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("manifest-bench").toFile
    def rm(f: java.io.File): Unit = Fs.rmTree(f)
    try {
      val leaf = new java.io.File(root, "acct/source=mb/year=2026/month=01")
      leaf.mkdirs()
      val leafPath = leaf.getAbsolutePath
      val cfg = CompactorConfig(
        maxRowsPerFile = 100000L,
        commitMode = CommitMode.Manifest,
        retainSuperseded = true,
      )
      def arrive(name: String): Unit = {
        val tmp = new java.io.File(leaf, s".tmp-$name")
        Seq((name, 1L)).toDF("tag", "v").coalesce(1).write.parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, new java.io.File(leaf, s"$name.parquet").toPath)
        tmp.listFiles().foreach(_.delete()); tmp.delete()
        ()
      }
      def commitOnce(): Double = {
        val live = ManifestCommit.liveFiles(spark, leafPath)
        val bytes = live.map(p => new java.io.File(p).length()).sum
        val t0 = System.nanoTime()
        val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, "mb", live, bytes), cfg)
        require(r.success, r.toString)
        (System.nanoTime() - t0) / 1e6
      }
      arrive("seed0"); arrive("seed1")
      var lastCommitMs = 0.0
      (1 to k).foreach { i =>
        arrive(s"a$i")
        lastCommitMs = commitOnce()
      }

      def timeMs(f: => Unit): Double = {
        f // warm
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      val headMs = timeMs { ManifestCommit.liveFiles(spark, leafPath); () }
      // strip the pointer: readers fall back to the full manifest scan
      leaf.listFiles().filter(_.getName.startsWith("_head-")).foreach(_.delete())
      val scanMs = timeMs { ManifestCommit.liveFiles(spark, leafPath); () }
      val manifests = leaf.listFiles().count(f => f.getName.startsWith("_manifest-"))
      println(
        s"""{"metric":"manifest_resolve","commits":$k,"manifests":$manifests,""" +
          s""""resolve_head_ms":$headMs,"resolve_scan_ms":$scanMs,""" +
          s""""last_commit_ms":$lastCommitMs}""",
      )
    } finally {
      rm(root)
      spark.stop()
    }
  }
}
