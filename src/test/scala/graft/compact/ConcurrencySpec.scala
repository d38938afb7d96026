package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Concurrent merge jobs on a shared SparkSession: 12 groups on an
  * 8-deep pool must all commit correctly — per-leaf staging dirs,
  * renames, and deletes cannot interfere across threads.
  */
class ConcurrencySpec extends AnyFunSuite with Matchers with SparkSpec {

  test("12 leaves compact concurrently without interference") {
    val s = spark
    import s.implicits._
    val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime
    val root = Files.createTempDirectory("graft-conc").toFile

    (0 until 12).foreach { i =>
      val leaf = new File(root, s"acct${i % 3}/source=s$i/year=2026/month=0${1 + i % 4}")
      leaf.mkdirs()
      (0 until 3).foreach { j =>
        val tmp = new File(leaf, s".tmp-$i-$j")
        (1 to 50).map(r => (r.toLong, s"leaf$i-f$j")).toDF("id", "tag")
          .coalesce(1).write.parquet(tmp.getAbsolutePath)
        val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
        Files.move(part.toPath, new File(leaf, s"f$j.parquet").toPath)
        tmp.listFiles().foreach(_.delete())
        tmp.delete()
        new File(leaf, s"f$j.parquet").setLastModified(staleMs)
      }
    }

    val cfg = CompactorConfig(
      targetFileBytes = 64 * 1024,
      asOf = Some(LocalDate.parse("2026-06-20")),
      maxConcurrentLeaves = 8,
    )
    val results = Compactor.run(spark, root.getAbsolutePath, cfg)

    results.size shouldBe 12
    results.foreach(r => withClue(r) { r.success shouldBe true })
    results.map(_.rowsWritten).sum shouldBe 12L * 3 * 50

    // every leaf holds exactly one compacted file with all its rows
    (0 until 12).foreach { i =>
      val leaf = new File(root, s"acct${i % 3}/source=s$i/year=2026/month=0${1 + i % 4}")
      val names = leaf.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName)
      names.length shouldBe 1
      names.head should fullyMatch regex s"s${i}_[0-9a-f]{32}\\.parquet"
      val tags = spark.read.parquet(leaf.getAbsolutePath)
        .select("tag").distinct().as[String].collect().sorted
      tags shouldBe (0 until 3).map(j => s"leaf$i-f$j").sorted.toArray
    }
  }

  test("a row-level delete racing a compaction on ONE leaf: serialized or loud abort — never a resurrected or duplicated row") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft-conc-row").toFile
    val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // several iterations vary the interleaving: plan capture, sidecar
      // seal, and head stamp land in a different order each run
      (1 to 5).foreach { iter =>
        val leaf = new File(root, s"race$iter"); leaf.mkdirs()
        val leafPath = leaf.getAbsolutePath
        Seq(("a", 1L to 100L), ("b", 101L to 200L)).foreach { case (t, ids) =>
          val tmp = new File(leaf, s".tmp-$t")
          ids.map(i => (i, t)).toDF("id", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          Files.move(part.toPath, new File(leaf, s"$t.parquet").toPath)
          tmp.listFiles().foreach(_.delete()); tmp.delete()
          ManifestCommit.publish(
            FileIndexer.fsFor(spark, leafPath), leafPath, s"arr$t", s"r$iter$t",
            inputsRel = Seq(), outputsRel = Seq(s"$t.parquet"), rows = ids.size.toLong)
        }
        val cond = col("id") % 10 === iter.toLong

        // the compactor captures its plan BEFORE the race begins — the
        // exact read-set-staleness window the tripwires must close
        val files = ManifestCommit.liveFiles(spark, leafPath)
        val plan = LeafPlan(leafPath, "fold", files, files.map(f => new File(f).length()).sum)
        val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
        val fCompact = scala.concurrent.Future(ManifestCommit.mergeAndCommit(spark, plan, cfg))(ec)
        val fDelete = scala.concurrent.Future(ManifestCommit.deleteWhereMoR(spark, leafPath, cond, cfg))(ec)
        val rCompact = scala.concurrent.Await.result(fCompact, scala.concurrent.duration.Duration("120s"))
        val rDelete = scala.concurrent.Await.result(fDelete, scala.concurrent.duration.Duration("120s"))

        // each racer either committed or aborted LOUDLY; an aborted
        // delete re-runs cleanly against the post-race state
        if (!rDelete.exists(_.success)) {
          withClue(s"iter $iter delete abort must be loud: $rDelete") {
            rDelete.foreach(_.error should not be empty)
          }
          val retry = ManifestCommit.deleteWhereMoR(spark, leafPath, cond, cfg)
          withClue(s"iter $iter delete retry: $retry") { retry.exists(_.success) shouldBe true }
        }
        withClue(s"iter $iter compaction result must be decisive: $rCompact") {
          if (!rCompact.success) rCompact.error should not be empty
        }

        // THE invariant: every cond row gone, every other row EXACTLY
        // once — neither a resurrected deleted row (a rewrite that
        // ignored the sidecar) nor a duplicate (a double-supersede)
        val got = ManifestCommit.readLeaf(spark, leafPath)
          .select("id").as[Long].collect().sorted
        got shouldBe (1L to 200L).filterNot(_ % 10 == iter).toArray
      }
    } finally { pool.shutdown() }
  }

  test("an EQUALITY delete racing a compaction on ONE leaf: serialized or loud abort — never a resurrected or duplicated row") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft-conc-eq").toFile
    val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // the eq commit's race surface differs from the position path's:
      // its scope is captured at plan time (requiresLive must abort it
      // if a racer superseded a scope file), and the racing rewrite
      // must abort on the sidecar it did not fold (knownDeletes)
      (1 to 5).foreach { iter =>
        val leaf = new File(root, s"eqrace$iter"); leaf.mkdirs()
        val leafPath = leaf.getAbsolutePath
        Seq(("a", 1L to 100L), ("b", 101L to 200L)).foreach { case (t, ids) =>
          val tmp = new File(leaf, s".tmp-$t")
          ids.map(i => (i, s"d$i", t)).toDF("id", "doc", "tag").coalesce(1).write.parquet(tmp.getAbsolutePath)
          val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
          Files.move(part.toPath, new File(leaf, s"$t.parquet").toPath)
          tmp.listFiles().foreach(_.delete()); tmp.delete()
          ManifestCommit.publish(
            FileIndexer.fsFor(spark, leafPath), leafPath, s"arr$t", s"eqr$iter$t",
            inputsRel = Seq(), outputsRel = Seq(s"$t.parquet"), rows = ids.size.toLong)
        }
        val keys = (1L to 200L).filter(_ % 10 == iter).map(i => s"d$i").toDF("doc")

        val files = ManifestCommit.liveFiles(spark, leafPath)
        val plan = LeafPlan(leafPath, "fold", files, files.map(f => new File(f).length()).sum)
        val ec = scala.concurrent.ExecutionContext.fromExecutor(pool)
        val fCompact = scala.concurrent.Future(ManifestCommit.mergeAndCommit(spark, plan, cfg))(ec)
        val fDelete = scala.concurrent.Future(ManifestCommit.deleteKeysMoR(spark, leafPath, keys, cfg))(ec)
        val rCompact = scala.concurrent.Await.result(fCompact, scala.concurrent.duration.Duration("120s"))
        val rDelete = scala.concurrent.Await.result(fDelete, scala.concurrent.duration.Duration("120s"))

        if (!rDelete.exists(_.success)) {
          withClue(s"iter $iter eq-delete abort must be loud: $rDelete") {
            rDelete.foreach(_.error should not be empty)
          }
          val retry = ManifestCommit.deleteKeysMoR(spark, leafPath, keys, cfg)
          withClue(s"iter $iter eq-delete retry: $retry") { retry.exists(_.success) shouldBe true }
        }
        withClue(s"iter $iter compaction result must be decisive: $rCompact") {
          if (!rCompact.success) rCompact.error should not be empty
        }

        val got = ManifestCommit.readLeaf(spark, leafPath)
          .select("id").as[Long].collect().sorted
        got shouldBe (1L to 200L).filterNot(_ % 10 == iter).toArray
      }
    } finally { pool.shutdown() }
  }
}
