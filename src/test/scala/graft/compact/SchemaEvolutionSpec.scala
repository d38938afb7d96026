package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The DECLARED schema-evolution contract of the manifest leaf, pinned
  * end to end. The format has no column registry — schema is the union
  * of the live files' parquet schemas under `mergeSchema` — so the
  * contract is:
  *
  *  - ADD a column: new files carry it; a merged read nullable-
  *    backfills older files' rows. Compaction MATERIALIZES the
  *    backfill (its output carries the union schema).
  *  - DROP a column: new files omit it; the column survives in merged
  *    reads (nulls for new rows) until compaction folds the last
  *    carrying file away. Stats/bloom sidecars for a column a file
  *    does not carry simply never prune it — the never-wrongly-pruned
  *    rule makes stale column metadata safe by construction.
  *  - RENAME = DROP + ADD: there is no identity linking the names; old
  *    rows read NULL under the new name. (A rename that must preserve
  *    history is a rewrite, not a metadata operation — by design.)
  *  - Predicates over evolved columns follow SQL NULL semantics
  *    everywhere: a deleteWhere cond that is NULL for a backfilled row
  *    leaves it alive; MoR position sidecars are schema-INDEPENDENT
  *    (file + ordinal).
  *  - Materialized aggregates are per-SPEC: a spec naming a column the
  *    delta cannot resolve falls back to the merged-schema read (diff)
  *    or rebuild, and a spec CHANGE is config drift — loud failure,
  *    rebuild under the new shape (the run loop's documented path).
  */
class SchemaEvolutionSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-schevo").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def stage(leaf: File, name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = new File(leaf, s".tmp-$name")
    df.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, name).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    val n = spark.read.parquet(new File(leaf, name).getAbsolutePath).count()
    ManifestCommit.publish(
      FileIndexer.fsFor(spark, leaf.getAbsolutePath), leaf.getAbsolutePath,
      s"arr-$name", s"run${name.hashCode.toHexString}",
      inputsRel = Seq(), outputsRel = Seq(name), rows = n)
  }

  private def compactAll(leafPath: String): Unit = {
    val files = ManifestCommit.liveFiles(spark, leafPath)
    val r = ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "fold", files, files.map(f => new File(f).length()).sum), cfg)
    withClue(r) { r.success shouldBe true }
    ()
  }

  test("ADD: merged reads nullable-backfill; compaction materializes the union schema; the feed carries it") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "add"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    stage(leaf, "v1.parquet", (1L to 50L).map(i => (i, s"t$i")).toDF("id", "tag"))
    val cursor = ChangeFeed.Cursor.atHead(spark, leafPath)
    stage(leaf, "v2.parquet", (51L to 80L).map(i => (i, s"t$i", i * 10)).toDF("id", "tag", "extra"))

    val merged = ManifestCommit.readLeaf(spark, leafPath)
    merged.columns.toSet shouldBe Set("id", "tag", "extra")
    merged.where(col("id") <= 50L && col("extra").isNull).count() shouldBe 50L
    merged.where(col("extra").isNotNull).count() shouldBe 30L

    // the incremental window resolves the new column too (readAppended
    // merges schemas across the window's files)
    val ch = ChangeFeed.changesSince(spark, leafPath, cursor)
    ChangeFeed.readAppended(spark, ch).columns should contain("extra")

    // compaction MATERIALIZES the backfill: one union-schema output
    compactAll(leafPath)
    val live = ManifestCommit.liveFiles(spark, leafPath)
    live.foreach { f =>
      spark.read.parquet(f).columns.toSet shouldBe Set("id", "tag", "extra")
    }
    val after = ManifestCommit.readLeaf(spark, leafPath)
    after.count() shouldBe 80L
    after.where(col("extra").isNull).count() shouldBe 50L
  }

  test("predicates on an evolved column keep SQL NULL semantics through deleteWhere — backfilled rows survive") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "del"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    stage(leaf, "v1.parquet", (1L to 40L).map(i => (i, s"t$i")).toDF("id", "tag"))
    stage(leaf, "v2.parquet", (41L to 60L).map(i => (i, s"t$i", i * 10)).toDF("id", "tag", "extra"))

    // cond references the NEW column: NULL for every v1 row → all survive
    val r = ManifestCommit.deleteWhere(spark, leafPath, col("extra") >= 500L, cfg).get
    withClue(r) { r.success shouldBe true }
    val got = ManifestCommit.readLeaf(spark, leafPath)
    got.count() shouldBe 40L + (41L to 60L).count(_ * 10 < 500)
    got.where(col("id") <= 40L).count() shouldBe 40L // backfilled rows untouched

    // and the MoR path is schema-INDEPENDENT (positions, not values):
    // delete old-schema rows by id through a sidecar, read through the
    // evolved merged schema
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("id") <= 5L, cfg).get.rowsWritten shouldBe 5L
    ManifestCommit.readLeaf(spark, leafPath).where(col("id") <= 5L).count() shouldBe 0L
  }

  test("DROP (and so RENAME = drop+add): omitted columns read as NULL for new rows; stale column sidecars never wrongly prune") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "drop"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    // v1 carries (id, score); the writer then DROPS score and ADDS score2
    stage(leaf, "v1.parquet", (1L to 30L).map(i => (i, i * 2)).toDF("id", "score"))
    // stats sidecar recorded for v1's score via a re-commit with stats
    val statsCfg = cfg.copy(statsColumns = Seq("id", "score"))
    compactAllWith(leafPath, statsCfg)
    stage(leaf, "v2.parquet", (31L to 50L).map(i => (i, i * 3)).toDF("id", "score2"))

    val merged = ManifestCommit.readLeaf(spark, leafPath)
    merged.columns.toSet shouldBe Set("id", "score", "score2")
    merged.where(col("score").isNull).count() shouldBe 20L // new rows lack the dropped column
    merged.where(col("score2").isNull).count() shouldBe 30L // old rows lack the added one

    // pruned read on the DROPPED column: v2 has no recorded interval for
    // `score` → conservatively kept; result equals the exact predicate
    val pruned = ManifestStats.readLeafFiltered(spark, leafPath, col("score") <= 20L)
    pruned.select("id").collect().map(_.getLong(0)).sorted shouldBe (1L to 10L).toArray

    // compaction folds the union schema; the dropped column's tail rows
    // persist as NULLs until a rewrite deliberately projects them away
    compactAll(leafPath)
    ManifestCommit.readLeaf(spark, leafPath).columns.toSet shouldBe Set("id", "score", "score2")
  }

  private def compactAllWith(leafPath: String, c: CompactorConfig): Unit = {
    val files = ManifestCommit.liveFiles(spark, leafPath)
    val r = ManifestCommit.mergeAndCommit(
      spark, LeafPlan(leafPath, "fold", files, files.map(f => new File(f).length()).sum), c)
    withClue(r) { r.success shouldBe true }
    ()
  }

  test("materialized aggregates across an evolution: old spec refreshes through the merged read; a spec CHANGE fails loudly and rebuilds under the new shape") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "agg"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-state").getAbsolutePath
    stage(leaf, "v1.parquet", (1L to 40L).map(i => (i % 5, i)).toDF("k", "amount"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))

    // the leaf evolves: new files carry an extra column — the OLD spec
    // keeps refreshing exactly (extra is simply not aggregated)
    stage(leaf, "v2.parquet", (41L to 60L).map(i => (i % 5, i, i * 7)).toDF("k", "amount", "extra"))
    val r1 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r1.seq should be > 0L
    val direct = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("amount")).as("sum_amount"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    MaterializedAgg.read(spark, aggPath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet shouldBe direct

    // widening the SPEC to the new column is config drift at the state:
    // loud failure (never a silently mixed-shape state) — the declared
    // recovery is a rebuild under the new shape
    val ex = intercept[IllegalArgumentException] {
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount", "extra"))
    }
    ex.getMessage should include("does not match spec")
    val aggPath2 = new File(root, "agg-state2").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggPath2, Seq("k"), Seq("amount", "extra"))
    val direct2 = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k").agg(sum(col("extra")).as("sum_extra"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    MaterializedAgg.read(spark, aggPath2).select("k", "sum_extra")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe direct2
  }

  test("a feed consumer survives a mid-evolution window: appended new-schema rows net against retracted old-schema rows without wedging") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "sync"); leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val idx = new File(root, "sync-idx").getAbsolutePath
    stage(leaf, "v1.parquet",
      (1L to 20L).map(i => (i, s"alpha beta doc$i")).toDF("doc_id", "text"))
    graft.operators.IndexStore.syncFromLeaf(spark, leafPath, idx)

    // ONE window holds an old-schema retraction (CoW delete rewrites
    // v1) AND a new-schema arrival — the netting's except algebra must
    // align the differently-shaped frames (null-fill), not throw on
    // every poll (the strict-select wedge caught in review)
    ManifestCommit.deleteWhere(spark, leafPath, col("doc_id") <= 5L, cfg).get.success shouldBe true
    stage(leaf, "v2.parquet",
      (21L to 25L).map(i => (i, s"alpha beta doc$i", "en")).toDF("doc_id", "text", "lang"))
    graft.operators.IndexStore.syncFromLeaf(spark, leafPath, idx)

    val oneShot = new File(root, "sync-idx-oneshot").getAbsolutePath
    graft.operators.IndexStore.build(
      spark, ManifestCommit.readLeaf(spark, leafPath).select("doc_id", "text"), oneShot)
    graft.operators.IndexStore.search(spark, idx, Seq("beta")).collect().map(_.toString).toSeq shouldBe
      graft.operators.IndexStore.search(spark, oneShot, Seq("beta")).collect().map(_.toString).toSeq
  }
}
