package graft.compact

import java.time.LocalDate

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property-style checks (SURVEY.md §5.2): for arbitrary generated file
  * layouts, the Planner's selection obeys every §2.3 rule. Seeded
  * generation keeps runs deterministic.
  */
class PlannerPropertySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val asOf = LocalDate.parse("2026-06-20")
  private val cfg = CompactorConfig(targetFileBytes = 64 * 1024, asOf = Some(asOf))
  private val staleMs = java.sql.Timestamp.valueOf("2026-06-01 00:00:00").getTime
  private val freshMs = java.sql.Timestamp.valueOf("2026-06-19 00:00:00").getTime
  private val hex32 = "[0-9a-f]{32}"

  private def genLayout(rnd: Random): Seq[FileMeta] = {
    val n = 5 + rnd.nextInt(60)
    (0 until n).map { k =>
      val acct = rnd.nextInt(3)
      val (leaf, fname) = rnd.nextInt(4) match {
        case 0 => // standard leaf, mixed names
          val leaf = s"/lake/acct$acct/source=s$acct/year=2026/month=0${1 + rnd.nextInt(5)}"
          val fname = rnd.nextInt(3) match {
            case 0 => s"new_$k.parquet"
            case 1 => s"s${acct}_${Seq.fill(32)("0123456789abcdef" (rnd.nextInt(16))).mkString}.parquet"
            case 2 => s"s${acct}_${100 + rnd.nextInt(900)}.parquet"
          }
          (leaf, fname)
        case 1 => // volatile current-month AWS/Azure
          val prov = if (rnd.nextBoolean()) "AWS" else "Azure"
          (s"/lake/acct$acct/$prov/source=v$acct/year=2026/month=06", s"new_$k.parquet")
        case 2 => // GCP
          val d = 1 + rnd.nextInt(3)
          val leaf = s"/lake/acct$acct/GCP/source=g$acct/year=2026/month=01"
          val fname =
            if (rnd.nextBoolean()) s"202601_2026-01-0${d}_f$k.parquet"
            else s"202601_2026-01-0${d}_${Seq.fill(32)("0123456789abcdef" (rnd.nextInt(16))).mkString}.parquet"
          (leaf, fname)
        case 3 => // no source= token -> basename falls back to "data"
          (s"/lake/acct$acct/misc/year=2026/month=02", s"f$k.parquet")
      }
      val size = if (rnd.nextInt(5) == 0) 100000 + rnd.nextInt(50000) else 100 + rnd.nextInt(5000)
      val mtime = if (rnd.nextInt(4) == 0) freshMs else staleMs
      FileMeta(s"$leaf/$fname", size.toLong, mtime)
    }
  }

  test("planner invariants hold for 20 random layouts") {
    val s = spark
    import s.implicits._
    (1 to 20).foreach { seed =>
      val rnd = new Random(seed)
      val files = genLayout(rnd)
      val byPath = files.map(f => f.path -> f).toMap
      val plans = Planner.plan(spark, files.toDS(), cfg)
      withClue(s"seed=$seed") {
        // unique group keys
        plans.map(p => (p.leaf, p.stem)).distinct.size shouldBe plans.size
        plans.foreach { p =>
          // >=2 gate
          p.files.size should be >= 2
          p.files.foreach { path =>
            val f = byPath(path)
            // provenance + size candidates + volatile skip
            f.size should be < cfg.targetFileBytes
            path should startWith(p.leaf + "/")
            p.leaf should not include "AWS"
            p.leaf should not include "Azure"
            val fname = path.split('/').last
            val compacted = fname.matches(s"${Regex.quote(p.stem)}_$hex32\\.parquet") ||
              (!p.leaf.contains("GCP") && fname.matches(s"${Regex.quote(p.stem)}_[0-9]+\\.parquet"))
            if (!compacted) {
              // non-compacted selections must be stale
              f.mtimeMs shouldBe staleMs
            }
            if (p.leaf.contains("GCP")) {
              // date isolation: every file carries the group key
              fname should startWith(p.stem + "_")
            }
          }
          // at most one compacted file (the newest) per group
          val compactedSel = p.files.count { path =>
            val fname = path.split('/').last
            fname.matches(s"${Regex.quote(p.stem)}_$hex32\\.parquet") ||
              (!p.leaf.contains("GCP") && fname.matches(s"${Regex.quote(p.stem)}_[0-9]+\\.parquet"))
          }
          compactedSel should be <= 1
        }
      }
    }
  }

  private object Regex {
    def quote(s: String): String = java.util.regex.Pattern.quote(s)
  }
}
