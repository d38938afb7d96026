package graft.compact

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Env config resolution (reference O11, configurator.py's env path):
  * every knob resolves, absence falls back to CompactorConfig defaults,
  * and a bogus commit mode fails loudly instead of silently renaming.
  */
class MainConfigSpec extends AnyFunSuite with Matchers {

  test("every knob resolves from the environment surface") {
    val cfg = Main.configFromEnv(Map(
      "TARGET_FILE_SIZE_GB" -> "0.5",
      "CHUNKED_ROWS" -> "500",
      "FRESHNESS_DAYS" -> "2",
      "SKIP_SOURCE_TYPE_CURRENT_MONTH" -> "AWS, GCP",
      "MAX_CONCURRENT_LEAVES" -> "8",
      "GRAFT_LAYOUT_KEYS" -> "l_partkey, l_suppkey",
      "GRAFT_LAYOUT_BITS" -> "8",
      "GRAFT_COMMIT_MODE" -> "Manifest",
      "GRAFT_GC_ORPHANS" -> "1",
      "GRAFT_EXPIRE_KEEP" -> "3",
      "GRAFT_MATAGG_ROOT" -> "/agg",
      "GRAFT_MATAGG_KEYS" -> "k, tag",
      "GRAFT_MATAGG_VALUES" -> "amount",
      "GRAFT_MATAGG_MINMAX" -> "amount, ts",
      "GRAFT_SYNC_INDEX" -> "/idx",
      "GRAFT_MAINT_DELETE_SIDECARS" -> "4",
      "GRAFT_MAINT_EQ_SIDECARS" -> "5",
      "GRAFT_RECLUSTER_KEY" -> "id",
      "GRAFT_RECLUSTER_DEPTH" -> "3.5",
      "GRAFT_CATALOG_ROOT" -> "/cat",
      "GRAFT_CATALOG_KEEP" -> "7",
      "GRAFT_CATALOG_GROUPS" -> "64",
    ))
    cfg.targetFileBytes shouldBe (0.5 * (1L << 30)).toLong
    cfg.maxRowsPerFile shouldBe 500L
    cfg.freshnessDays shouldBe 2
    cfg.skipProvidersCurrentMonth shouldBe Seq("AWS", "GCP")
    cfg.maxConcurrentLeaves shouldBe 8
    cfg.layoutKeys shouldBe Seq("l_partkey", "l_suppkey")
    cfg.layoutBits shouldBe 8
    cfg.commitMode shouldBe CommitMode.Manifest
    cfg.autoGcOrphans shouldBe true
    cfg.expireKeepSnapshots shouldBe Some(3)
    cfg.matAggRoot shouldBe Some("/agg")
    cfg.matAggKeys shouldBe Seq("k", "tag")
    cfg.matAggValues shouldBe Seq("amount")
    cfg.matAggMinMax shouldBe Seq("amount", "ts")
    cfg.syncIndexRoot shouldBe Some("/idx")
    cfg.maintainDeleteSidecarsMax shouldBe Some(4)
    cfg.maintainEqSidecarsMax shouldBe Some(5)
    cfg.reclusterColumn shouldBe Some("id")
    cfg.reclusterMaxDepth shouldBe 3.5
    cfg.catalogRoot shouldBe Some("/cat")
    cfg.catalogKeepSnapshots shouldBe Some(7)
    cfg.catalogGroups shouldBe Some(64)
  }

  test("an empty environment yields exactly the defaults") {
    Main.configFromEnv(Map.empty) shouldBe CompactorConfig()
  }

  test("unrelated env vars are ignored; commit mode is case-insensitive") {
    val cfg = Main.configFromEnv(Map("PATH" -> "/usr/bin", "GRAFT_COMMIT_MODE" -> "RENAME"))
    cfg shouldBe CompactorConfig()
  }

  test("a bogus commit mode fails loudly") {
    an[Exception] should be thrownBy Main.configFromEnv(Map("GRAFT_COMMIT_MODE" -> "mv"))
  }
}
