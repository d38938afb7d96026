package graft.compact

import java.io.File
import java.nio.file.Files
import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** End-to-end randomized compaction: seeded random leaf trees mixing
  * every file class (new-stale, new-fresh, already-compacted old + tail,
  * oversize, volatile partitions, GCP date keys), then the whole-corpus
  * invariants of SURVEY.md §2.3 checked after a run — and after a
  * second run (convergence: a re-run must change nothing).
  *
  * Complements PlannerPropertySpec (pure planning properties) by
  * pushing randomized layouts through the REAL merge+commit path.
  */
class CompactorFuzzSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val asOf = LocalDate.parse("2026-06-20")
  private val staleMs = java.sql.Timestamp.valueOf("2026-06-10 00:00:00").getTime
  private val freshMs = java.sql.Timestamp.valueOf("2026-06-18 00:00:00").getTime
  private val hex32 = "[0-9a-f]{32}"

  private def df(tag: String, n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")
  }

  private def writeFile(dir: File, name: String, data: DataFrame, mtimeMs: Long): Unit = {
    val tmp = new File(dir, s".tmp-${System.nanoTime()}")
    data.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val dest = new File(dir, name)
    Files.move(part.toPath, dest.toPath)
    tmp.listFiles().foreach(_.delete())
    tmp.delete()
    dest.setLastModified(mtimeMs)
    ()
  }

  private def bag(dir: File): Map[(Long, String), Int] = {
    val s = spark
    import s.implicits._
    spark.read.parquet(dir.getAbsolutePath).as[(Long, String)]
      .collect().groupBy(identity).view.mapValues(_.length).toMap
  }

  private def allParquet(root: File): Seq[File] = {
    def walk(f: File): Seq[File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Seq(f)
      else Seq.empty
    walk(root)
  }

  /** One random leaf; returns (dir, volatile?). Zero-padded month
    * matters: the volatile rule matches the Planner's `month=%02d`.
    */
  private def genLeaf(root: File, rnd: Random, id: Int): (File, Boolean) = {
    val volatileLeaf = rnd.nextInt(5) == 0
    val gcp = !volatileLeaf && rnd.nextInt(4) == 0
    val dir =
      if (volatileLeaf) new File(root, s"acct$id/AWS/source=s$id/year=2026/month=06")
      else if (gcp) new File(root, s"acct$id/GCP/source=s$id/year=2026/month=01")
      else new File(root, s"acct$id/OCP/source=s$id/year=2026/month=01")
    dir.mkdirs()
    val nFiles = 1 + rnd.nextInt(5)
    (1 to nFiles).foreach { j =>
      val tag = s"l$id-f$j"
      val isFresh = rnd.nextInt(4) == 0
      val mtime = if (isFresh) freshMs else staleMs - rnd.nextInt(5) * 86400000L
      val name =
        if (gcp) s"202601_2026-01-0${1 + rnd.nextInt(2)}_f$j.parquet"
        else if (rnd.nextInt(5) == 0) s"s${id}_${Seq.fill(32)(rnd.nextInt(16).toHexString).mkString}.parquet"
        else s"new_$j.parquet"
      writeFile(dir, name, df(tag, 5 + rnd.nextInt(20)), mtime)
    }
    (dir, volatileLeaf)
  }

  test("seeded random trees: bag preservation, volatile untouched, convergent re-run") {
    val rnd = new Random(20260812L)
    (1 to 3).foreach { trial =>
      val root = Files.createTempDirectory(s"graft-fuzz-$trial").toFile
      try {
        val leaves = (1 to 8).map(i => genLeaf(root, rnd, i))
        val before = leaves.map { case (d, _) => d -> bag(d) }.toMap
        val beforeNames = leaves.map { case (d, _) => d -> allParquet(d).map(_.getName).toSet }.toMap

        val cfg = CompactorConfig(
          targetFileBytes = 64 * 1024,
          maxRowsPerFile = 1000000L,
          asOf = Some(asOf),
          maxConcurrentLeaves = 3,
        )
        val r1 = Compactor.run(spark, root.getAbsolutePath, cfg)
        withClue(r1.filterNot(_.success)) { r1.forall(_.success) shouldBe true }

        leaves.foreach { case (dir, isVolatile) =>
          // row preservation: the multiset of rows never changes
          withClue(s"$trial/$dir") { bag(dir) shouldBe before(dir) }
          if (isVolatile) {
            // volatile partitions: exact same files, byte-level untouched
            allParquet(dir).map(_.getName).toSet shouldBe beforeNames(dir)
          } else {
            // every produced file carries the committed naming scheme
            val produced = allParquet(dir).map(_.getName).toSet -- beforeNames(dir)
            produced.foreach(n => n should fullyMatch regex s".+_$hex32\\.parquet")
          }
        }

        // convergence: a second run must be a no-op on the files
        val afterFirst = leaves.map { case (d, _) => d -> allParquet(d).map(_.getName).toSet }.toMap
        val r2 = Compactor.run(spark, root.getAbsolutePath, cfg)
        withClue(r2.filterNot(_.success)) { r2.forall(_.success) shouldBe true }
        leaves.foreach { case (dir, _) =>
          withClue(s"$trial/$dir re-run") {
            allParquet(dir).map(_.getName).toSet shouldBe afterFirst(dir)
            bag(dir) shouldBe before(dir)
          }
        }
      } finally {
        def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
        rm(root)
      }
    }
  }
}
