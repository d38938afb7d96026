package graft.compact

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions.{col, count, lit, sum}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The incremental materialized aggregate must equal a from-scratch
  * GROUP-BY of the current live set after ANY commit mix — arrivals,
  * compactions (which add and remove the same rows), range rewrites —
  * reading only the delta files; and it must detect GC'd history and
  * fall back to a full rebuild rather than subtract from thin air.
  */
class MaterializedAggSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val cfg = CompactorConfig(
    targetFileBytes = 10L * 1024 * 1024,
    maxRowsPerFile = 1000L,
    commitMode = CommitMode.Manifest,
    retainSuperseded = true, // keep history readable for the ⊖ term
  )

  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-matagg").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  /** One visible file of ids [lo, hi): key = id % 7, amount = id. */
  private def writeFile(leaf: File, name: String, lo: Long, hi: Long): Unit = {
    val s = spark
    import s.implicits._
    val tmp = new File(leaf, s".tmp-$name")
    (lo until hi).map(i => (i % 7, i)).toDF("k", "amount")
      .coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    Files.move(part.toPath, new File(leaf, name).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    ()
  }

  private def commit(leafPath: String, stem: String, files: Seq[String]): Unit = {
    val bytes = files.map(p => new File(p).length()).sum
    val r = Merger.mergeAndCommit(spark, LeafPlan(leafPath, stem, files, bytes), cfg)
    withClue(r) { r.success shouldBe true }
    ()
  }

  private def fullAgg(leafPath: String) =
    ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k").agg(count(lit(1)).as("cnt"), sum(col("amount")).as("sum_amount"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "cnt", "sum_amount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("refresh stays exact through arrivals, compaction, and range rewrite — reading only deltas") {
    val leaf = new File(root, "acct/source=ma/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-ma").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "m1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 400L, 900L)
    commit(leafPath, "m2", abs("b.parquet"))

    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // 1) pure arrival: delta = the new commit's outputs only
    writeFile(leaf, "c.parquet", 900L, 1300L)
    commit(leafPath, "m3", abs("c.parquet"))
    val r1 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r1.incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // 2) compaction: rewrites the whole live set — adds outputs,
    // removes inputs carrying the SAME rows; the ⊕/⊖ must net to zero
    commit(leafPath, "m4", ManifestCommit.liveFiles(spark, leafPath))
    val r2 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r2.incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // 3) a no-op refresh is a no-op
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
      .incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // 4) drifted caller fails loudly, never wrongly
    an[IllegalArgumentException] should be thrownBy
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("other"))

    // only one sealed state survives a refresh chain
    val names = new File(aggPath).listFiles().map(_.getName)
    names.count(_.startsWith("state-")) shouldBe 1
    names.count(_.startsWith("_agg-")) shouldBe 1
    names.count(_.startsWith("files-")) shouldBe 1
  }

  test("a pure-compaction window refreshes a cnt/sum state with ZERO data read (walk mode)") {
    val leaf = new File(root, "acct/source=mawalk0/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-walk0").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "w1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 400L, 900L)
    commit(leafPath, "w2", abs("b.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    val before = rows(MaterializedAgg.read(spark, aggPath))

    // full compaction: adds outputs, removes inputs carrying the same rows
    commit(leafPath, "w3", ManifestCommit.liveFiles(spark, leafPath))

    // PROOF of zero data read: replace every live parquet with garbage —
    // any refresh path that opened a data file would throw; the walk
    // classifies the window as a pure replace and reads nothing
    ManifestCommit.liveFiles(spark, leafPath).foreach { p =>
      Files.write(new File(p).toPath, Array[Byte](0x13, 0x37)); ()
    }
    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r.mode shouldBe "walk"
    r.incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe before
  }

  test("arrival+compaction+arrival window: walk reads the arrivals' outputs, never the merged leaf") {
    val leaf = new File(root, "acct/source=mawalk1/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-walk1").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "x1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))

    writeFile(leaf, "c.parquet", 400L, 700L)
    commit(leafPath, "x2", abs("c.parquet"))
    val arrivalsKeptLive = ManifestCommit.liveFiles(spark, leafPath)
    commit(leafPath, "x3", arrivalsKeptLive) // compacts a+c into merged outputs
    writeFile(leaf, "e.parquet", 700L, 950L)
    commit(leafPath, "x4", abs("e.parquet"))
    val expected = rows(fullAgg(leafPath))

    // corrupt ONLY the compaction's merged outputs (still live): the walk
    // must price this window as ⊕(c outputs) ⊕ (e outputs) — the merged
    // files net to zero and are never opened
    val eOutputs = ManifestCommit.manifestLog(spark, leafPath)
      .filter(_.stem == "x4").flatMap(_.outputs).map(rel => s"$leafPath/$rel").toSet
    ManifestCommit.liveFiles(spark, leafPath).filterNot(eOutputs).foreach { p =>
      Files.write(new File(p).toPath, Array[Byte](0x13, 0x37)); ()
    }
    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r.mode shouldBe "walk"
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe expected
  }

  test("a checkpointed commit window falls back to live-set diff, still exact") {
    val leaf = new File(root, "acct/source=mawalk2/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-walk2").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "y1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    writeFile(leaf, "b.parquet", 400L, 800L)
    commit(leafPath, "y2", abs("b.parquet"))
    commit(leafPath, "y3", ManifestCommit.liveFiles(spark, leafPath))

    // fold every manifest in the window into a checkpoint: the changelog
    // is no longer contiguous, so the walk must refuse and the live-set
    // diff (which survives any log lifecycle) must carry the refresh
    val head = ManifestCommit.currentSeq(spark, leafPath)
    ManifestCommit.checkpoint(spark, leafPath, beforeSeq = head + 1)
    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r.mode shouldBe "diff"
    r.incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))
  }

  test("Compactor lifecycle builds then refreshes the per-leaf materialized agg") {
    val lcRoot = new File(root, "lc")
    val leaf = new File(lcRoot, "acct/source=malc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggRoot = new File(root, "agg-lc").getAbsolutePath
    // retainSuperseded OFF here: the planner lists physical files, so a
    // retained superseded raw arrival would be re-planned next run.
    // Pure-arrival refreshes never need the ⊖ term's inputs anyway —
    // files committed after the state sealed were never in its recorded
    // list, so the delta is adds-only.
    val lcCfg = cfg.copy(
      retainSuperseded = false,
      matAggRoot = Some(aggRoot),
      matAggKeys = Seq("k"),
      matAggValues = Seq("amount"),
    )
    val staleMs = java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime
    def staleAll(): Unit =
      leaf.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .foreach { f => f.setLastModified(staleMs); () }

    writeFile(leaf, "a.parquet", 0L, 400L)
    writeFile(leaf, "b.parquet", 400L, 700L)
    staleAll()
    val r1 = Compactor.run(spark, lcRoot.getAbsolutePath, lcCfg)
    r1 should not be empty
    r1.foreach(r => withClue(r) { r.success shouldBe true })
    // the lifecycle keys state by the leaf string the LISTING produced
    // (a file: URI here) — derive the path from the result through the
    // same pathFor a dashboard reader would use
    val aggPath = MaterializedAgg.pathFor(aggRoot, r1.head.leaf)
    MaterializedAgg.exists(spark, aggPath) shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // second run over fresh arrivals refreshes the SAME state in place
    writeFile(leaf, "c.parquet", 700L, 1100L)
    writeFile(leaf, "d.parquet", 1100L, 1200L)
    staleAll()
    val r2 = Compactor.run(spark, lcRoot.getAbsolutePath, lcCfg)
    r2 should not be empty
    r2.foreach(r => withClue(r) { r.success shouldBe true })
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))
    // the refresh advanced the sealed seq to the leaf head (no rebuild
    // markers left behind — exactly one state survives)
    new File(aggPath).listFiles().map(_.getName).count(_.startsWith("state-")) shouldBe 1
  }

  test("sumSq columns refresh exactly and derive mean/variance downstream") {
    val leaf = new File(root, "acct/source=masq/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-masq").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "s1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), sumSq = Seq("amount"))

    // arrival + compaction, refreshed through the same ⊕/⊖ path —
    // squares must negate exactly like sums
    writeFile(leaf, "b.parquet", 400L, 900L)
    commit(leafPath, "s2", abs("b.parquet"))
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), sumSq = Seq("amount"))
      .incremental shouldBe true
    commit(leafPath, "s3", ManifestCommit.liveFiles(spark, leafPath))
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), sumSq = Seq("amount"))
      .incremental shouldBe true

    val direct = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("amount")).as("sum_amount"),
        sum(col("amount") * col("amount")).as("sumsq_amount"),
      )
    def all(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "cnt", "sum_amount", "sumsq_amount").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    all(MaterializedAgg.read(spark, aggPath)) shouldBe all(direct)

    // exact integer state ⇒ exact derived mean/variance per group
    val (k0, cnt0, s0, sq0) = all(MaterializedAgg.read(spark, aggPath)).minBy(_._1)
    val members = (0L until 900L).filter(_ % 7 == k0)
    cnt0 shouldBe members.size.toLong
    s0 shouldBe members.sum
    sq0 shouldBe members.map(m => m * m).sum
  }

  test("sumSqWide keeps sum of squares exact past long range, through arrival + compaction + removal") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "acct/source=mawide/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mawide").getAbsolutePath

    // every amount's square exceeds Long.MaxValue — the narrow path
    // would wrap on the FIRST row, let alone the ⊕/⊖ chain
    val base = 4000000000L
    (BigInt(base) * BigInt(base) > BigInt(Long.MaxValue)) shouldBe true
    def writeBig(name: String, lo: Long, hi: Long): Unit = {
      val tmp = new File(leaf, s".tmp-$name")
      (lo until hi).map(i => (i % 3, base + i)).toDF("k", "amount")
        .coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new File(leaf, name).toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      ()
    }
    def refreshWide() =
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"),
        sumSq = Seq("amount"), sumSqWide = true)

    writeBig("a.parquet", 0L, 300L)
    commit(leafPath, "w1", Seq(s"$leafPath/a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"),
      sumSq = Seq("amount"), sumSqWide = true)

    writeBig("b.parquet", 300L, 700L) // arrival
    commit(leafPath, "w2", Seq(s"$leafPath/b.parquet"))
    refreshWide().incremental shouldBe true
    commit(leafPath, "w3", ManifestCommit.liveFiles(spark, leafPath)) // compaction
    refreshWide().incremental shouldBe true
    // partial rewrite: a strict subset removed and re-added (the ⊖ term
    // subtracts decimal squares of real magnitude, not a net-zero fold)
    commit(leafPath, "w4", ManifestCommit.liveFiles(spark, leafPath).take(1))
    refreshWide().incremental shouldBe true

    val truth = (0L until 700L).groupBy(_ % 3).map { case (k, ids) =>
      k -> (ids.size.toLong, ids.map(base + _).sum, ids.map(i => BigInt(base + i) * BigInt(base + i)).sum)
    }
    val state = MaterializedAgg.read(spark, aggPath)
      .select("k", "cnt", "sum_amount", "sumsq_amount").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), BigInt(r.getDecimal(3).toBigInteger)))).toMap
    state.keySet shouldBe truth.keySet
    state.foreach { case (k, got) => withClue(s"k=$k") { got shouldBe truth(k) } }

    // flag drift fails loudly: a narrow refresh against the wide state
    // (or the reverse) would re-open the overflow window
    an[IllegalArgumentException] should be thrownBy
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), sumSq = Seq("amount"))
  }

  test("group-count tripwire fails loudly and leaves the previous state live") {
    val leaf = new File(root, "acct/source=matrip/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-matrip").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 500L)
    commit(leafPath, "t1", abs("a.parquet"))

    // a build past the cap never seals anything
    a[MaterializedAgg.GroupExplosionException] should be thrownBy
      MaterializedAgg.build(spark, leafPath, aggPath, Seq("amount"), Nil, maxGroups = 100L)
    MaterializedAgg.exists(spark, aggPath) shouldBe false

    // a sane build seals; a later refresh past a (lowered) cap trips
    // AFTER writing but BEFORE the pointer — the old state stays live
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    val before = rows(MaterializedAgg.read(spark, aggPath))
    writeFile(leaf, "b.parquet", 500L, 600L)
    commit(leafPath, "t2", abs("b.parquet"))
    a[MaterializedAgg.GroupExplosionException] should be thrownBy
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), maxGroups = 3L)
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe before
    // and the same refresh at the default cap completes
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
      .incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))
  }

  test("refreshAll brings several states of one leaf to head, deltas read once") {
    val leaf = new File(root, "acct/source=maall/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val p1 = new File(root, "agg-all1").getAbsolutePath
    val p2 = new File(root, "agg-all2").getAbsolutePath
    val p3 = new File(root, "agg-all3").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 300L)
    commit(leafPath, "m1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, p1, Seq("k"), Seq("amount"))
    MaterializedAgg.build(spark, leafPath, p2, Seq("k"), Seq("amount"), sumSq = Seq("amount"))

    writeFile(leaf, "b.parquet", 300L, 700L)
    commit(leafPath, "m2", abs("b.parquet"))
    // a state built at a DIFFERENT seq than the other two
    MaterializedAgg.build(spark, leafPath, p3, Seq("k"), Nil)

    writeFile(leaf, "c.parquet", 700L, 900L)
    commit(leafPath, "m3", abs("c.parquet"))

    val specs = Seq(
      MaterializedAgg.AggSpec(p1, Seq("k"), Seq("amount")),
      MaterializedAgg.AggSpec(p2, Seq("k"), Seq("amount"), sumSq = Seq("amount")),
      MaterializedAgg.AggSpec(p3, Seq("k"), Nil),
    )
    val rs = MaterializedAgg.refreshAll(spark, leafPath, specs)
    rs.map(_.incremental) shouldBe Seq(true, true, true)
    rs.map(_.seq).distinct.size shouldBe 1

    rows(MaterializedAgg.read(spark, p1)) shouldBe rows(fullAgg(leafPath))
    val direct = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("amount")).as("sum_amount"),
        sum(col("amount") * col("amount")).as("sumsq_amount"),
      )
    def sq(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "cnt", "sum_amount", "sumsq_amount").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    sq(MaterializedAgg.read(spark, p2)) shouldBe sq(direct)
    MaterializedAgg.read(spark, p3).select("k", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe
      rows(fullAgg(leafPath)).map(t => (t._1, t._2))

    // already-current states are a no-op round
    MaterializedAgg.refreshAll(spark, leafPath, specs).map(_.incremental) shouldBe Seq(true, true, true)
  }

  test("randomized commit mix: refresh equals from-scratch after every step (seeded)") {
    val rnd = new scala.util.Random(20260814L)
    val leaf = new File(root, "acct/source=mafuzz/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mafuzz").getAbsolutePath

    writeFile(leaf, "seed.parquet", 0L, 200L)
    commit(leafPath, "z0", Seq(s"$leafPath/seed.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))

    var nextLo = 200L
    (1 to 10).foreach { i =>
      rnd.nextInt(3) match {
        case 0 => // arrival of a fresh id range
          val hi = nextLo + 50L + rnd.nextInt(200)
          writeFile(leaf, s"f$i.parquet", nextLo, hi)
          commit(leafPath, s"z$i", Seq(s"$leafPath/f$i.parquet"))
          nextLo = hi
        case 1 => // full compaction: adds + removes carry the same rows
          commit(leafPath, s"z$i", ManifestCommit.liveFiles(spark, leafPath))
        case _ => // partial rewrite of a random live subset
          val live = ManifestCommit.liveFiles(spark, leafPath)
          commit(leafPath, s"z$i", rnd.shuffle(live).take(1 + rnd.nextInt(live.size)))
      }
      val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
      withClue(s"step $i") {
        r.incremental shouldBe true
        rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))
      }
    }
  }

  test("GC'd history: the walk survives via the producer ledger; a checkpointed window forces the rebuild") {
    val leaf = new File(root, "acct/source=magc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-magc").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 300L)
    commit(leafPath, "g1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))

    // compact (supersedes the state's recorded file), then simulate GC
    // of the superseded original BEFORE the refresh runs: the walk
    // verifies net-zero from the PRODUCER LEDGER (g1's sealed row
    // count), so the non-retaining config still refreshes with zero
    // data read — GC'd inputs no longer force a rebuild
    val recorded = ManifestCommit.liveFiles(spark, leafPath)
    commit(leafPath, "g2", recorded)
    recorded.foreach(p => new File(p).delete())

    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r.mode shouldBe "walk"
    r.incremental shouldBe true
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // now make the window unclassifiable: arrival + compaction + GC,
    // then a checkpoint folds the manifests — the walk refuses the
    // non-contiguous log, the diff's ⊖ inputs are gone, and the
    // refresh must fall all the way back to a full rebuild
    writeFile(leaf, "b.parquet", 300L, 500L)
    commit(leafPath, "g3", abs("b.parquet"))
    val live2 = ManifestCommit.liveFiles(spark, leafPath)
    commit(leafPath, "g4", live2)
    live2.foreach(p => new File(p).delete())
    ManifestCommit.checkpoint(spark, leafPath, beforeSeq = ManifestCommit.currentSeq(spark, leafPath))

    val r2 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r2.mode shouldBe "rebuild"
    r2.incremental shouldBe false
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))
  }

  // ---------------- min/max via per-file partials ----------------

  private def fullAggMM(leafPath: String) =
    ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("amount")).as("sum_amount"),
        org.apache.spark.sql.functions.min(col("amount")).as("min_amount"),
        org.apache.spark.sql.functions.max(col("amount")).as("max_amount"),
      )

  private def mmRows(df: org.apache.spark.sql.DataFrame) =
    df.select("k", "cnt", "sum_amount", "min_amount", "max_amount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet

  /** Publish a DELETE-WHERE shaped commit: the whole live set covered,
    * one filtered rewrite added. The table-format layer supports
    * arbitrary file-set commits; this is the one that makes min/max
    * genuinely non-invertible (rows carrying the max disappear).
    */
  private def deleteWhereCommit(leaf: File, leafPath: String, stem: String, keepBelow: Long): Unit = {
    val live = ManifestCommit.liveFiles(spark, leafPath)
    val kept = ManifestCommit.readLeaf(spark, leafPath).where(col("amount") < keepBelow)
    val n = kept.count()
    val tmp = new File(leaf, s".tmp-$stem")
    kept.coalesce(1).write.parquet(tmp.getAbsolutePath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
    val outName = s"$stem.parquet"
    Files.move(part.toPath, new File(leaf, outName).toPath)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
    val rel = live.map(_.stripPrefix(leafPath + "/"))
    ManifestCommit.publish(
      FileIndexer.fsFor(spark, leafPath), leafPath, stem, s"run-$stem", rel, Seq(outName), n)
  }

  test("minMax refreshes through arrival, compaction, and a delete-rewrite — the max shrinks without a leaf rescan") {
    val leaf = new File(root, "acct/source=mamm/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mamm").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")
    def refreshMM() =
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "m1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))

    // arrival RAISES the max (the semigroup-friendly direction)
    writeFile(leaf, "b.parquet", 400L, 900L)
    commit(leafPath, "m2", abs("b.parquet"))
    refreshMM().incremental shouldBe true
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))

    // compaction rewrites everything: partials collapse to the merged
    // file's, the fold must net to the same min/max
    commit(leafPath, "m3", ManifestCommit.liveFiles(spark, leafPath))
    refreshMM().incremental shouldBe true
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))

    // delete-rewrite drops every amount >= 850: the max must SHRINK —
    // the case no ⊕/⊖ trick survives; the partials anti-join + refold
    // does, reading zero leaf data beyond the one added file
    deleteWhereCommit(leaf, leafPath, "del", keepBelow = 850L)
    refreshMM().incremental shouldBe true
    val after = mmRows(MaterializedAgg.read(spark, aggPath))
    after shouldBe mmRows(fullAggMM(leafPath))
    after.map(_._5).max shouldBe 849L

    // flag drift fails loudly both ways: a minMax state refreshed
    // without minMax (and vice versa) would silently drop/misread cols
    an[IllegalArgumentException] should be thrownBy
      MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))

    // exactly one sealed state generation; every partials generation
    // the single ledger names is present, nothing else survives reclaim
    val names = new File(aggPath).listFiles().map(_.getName)
    names.count(_.startsWith("state-")) shouldBe 1
    names.count(_.startsWith("pgens-")) shouldBe 1
    val ledger = java.nio.file.Files.readString(
      new File(aggPath).listFiles().find(_.getName.startsWith("pgens-")).get.toPath,
    ).split("\n").filter(_.nonEmpty).toSet
    names.filter(n => n.startsWith("pgen-") || n.startsWith("partials-")).toSet shouldBe ledger
    names.count(_.startsWith("files-")) shouldBe 1
    names.count(_.startsWith("_agg-")) shouldBe 1
  }

  test("refreshAll maintains a minMax spec next to plain specs off the shared delta") {
    val leaf = new File(root, "acct/source=mammall/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val p1 = new File(root, "agg-mmall1").getAbsolutePath
    val p2 = new File(root, "agg-mmall2").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 300L)
    commit(leafPath, "m1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, p1, Seq("k"), Seq("amount"))
    MaterializedAgg.build(spark, leafPath, p2, Seq("k"), Seq("amount"), minMax = Seq("amount"))

    writeFile(leaf, "b.parquet", 300L, 700L)
    commit(leafPath, "m2", abs("b.parquet"))
    deleteWhereCommit(leaf, leafPath, "delall", keepBelow = 650L)

    val rs = MaterializedAgg.refreshAll(spark, leafPath, Seq(
      MaterializedAgg.AggSpec(p1, Seq("k"), Seq("amount")),
      MaterializedAgg.AggSpec(p2, Seq("k"), Seq("amount"), minMax = Seq("amount")),
    ))
    rs.map(_.incremental) shouldBe Seq(true, true)
    rows(MaterializedAgg.read(spark, p1)) shouldBe rows(fullAgg(leafPath))
    mmRows(MaterializedAgg.read(spark, p2)) shouldBe mmRows(fullAggMM(leafPath))
    mmRows(MaterializedAgg.read(spark, p2)).map(_._5).max shouldBe 649L
  }

  test("minMax is exact over NULL group keys and all-null value groups — no false corruption trips") {
    val s = spark
    import s.implicits._
    val leaf = new File(root, "acct/source=mamnull/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mamnull").getAbsolutePath
    // k NULL for every 5th id (a legitimate null-key group); amount NULL
    // for the whole k=9 group (min/max legitimately NULL there)
    def writeNullable(name: String, lo: Long, hi: Long): Unit = {
      val tmp = new File(leaf, s".tmp-$name")
      (lo until hi).map { i =>
        val k = if (i % 5 == 0) None else Some(i % 3)
        val amount = if (k.contains(2L)) None else Some(i)
        (k, amount)
      }.toDF("k", "amount").coalesce(1).write.parquet(tmp.getAbsolutePath)
      val part = tmp.listFiles().find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, new File(leaf, name).toPath)
      tmp.listFiles().foreach(_.delete()); tmp.delete()
      ()
    }
    def truth() = ManifestCommit.readLeaf(spark, leafPath)
      .groupBy("k")
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("amount")).as("sum_amount"),
        org.apache.spark.sql.functions.min(col("amount")).as("min_amount"),
        org.apache.spark.sql.functions.max(col("amount")).as("max_amount"),
      )
    def optRows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "cnt", "sum_amount", "min_amount", "max_amount").collect()
        .map(r => (0 until 5).map(i => Option(r.get(i))).toList).toSet

    writeNullable("a.parquet", 0L, 200L)
    commit(leafPath, "n1", Seq(s"$leafPath/a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    optRows(MaterializedAgg.read(spark, aggPath)) shouldBe optRows(truth())
    // the all-null-value group really is in the state, with NULL min/max
    val nullMm = MaterializedAgg.read(spark, aggPath).where(col("k") === 2)
      .select("min_amount", "max_amount").collect()
    nullMm should have length 1
    nullMm.head.isNullAt(0) shouldBe true

    // arrival + delete-rewrite still exact through the null-safe join
    writeNullable("b.parquet", 200L, 500L)
    commit(leafPath, "n2", Seq(s"$leafPath/b.parquet"))
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
      .incremental shouldBe true
    optRows(MaterializedAgg.read(spark, aggPath)) shouldBe optRows(truth())
    deleteWhereCommit(leaf, leafPath, "ndel", keepBelow = 400L)
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
      .incremental shouldBe true
    optRows(MaterializedAgg.read(spark, aggPath)) shouldBe optRows(truth())
  }

  test("a rebuild at an unchanged head seq re-seals idempotently (spec-drift fallback path)") {
    val leaf = new File(root, "acct/source=mareseal/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mareseal").getAbsolutePath
    writeFile(leaf, "a.parquet", 0L, 200L)
    commit(leafPath, "r1", Seq(s"$leafPath/a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    // same head, new shape: the pointer already exists — build must
    // overwrite the state and re-seal, not collide
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))
    val names = new File(aggPath).listFiles().map(_.getName)
    names.count(_.startsWith("state-")) shouldBe 1
    names.count(_.startsWith("_agg-")) shouldBe 1
  }

  test("Compactor lifecycle rebuilds under a toggled matAggMinMax instead of freezing the aggregate") {
    val lcRoot = new File(root, "lcmm")
    val leaf = new File(lcRoot, "acct/source=mamlc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggRoot = new File(root, "agg-mamlc").getAbsolutePath
    val base = cfg.copy(
      retainSuperseded = false,
      matAggRoot = Some(aggRoot),
      matAggKeys = Seq("k"),
      matAggValues = Seq("amount"),
    )
    val staleMs = java.sql.Timestamp.valueOf("2020-01-01 00:00:00").getTime
    def staleAll(): Unit =
      leaf.listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .foreach { f => f.setLastModified(staleMs); () }

    writeFile(leaf, "a.parquet", 0L, 300L)
    writeFile(leaf, "a2.parquet", 300L, 400L)
    staleAll()
    val r1 = Compactor.run(spark, lcRoot.getAbsolutePath, base)
    r1 should not be empty
    r1.foreach(r => withClue(r) { r.success shouldBe true })
    val aggPath = MaterializedAgg.pathFor(aggRoot, r1.head.leaf)
    MaterializedAgg.read(spark, aggPath).columns should not contain "min_amount"

    // operator toggles minMax ON; next run's refresh hits the schema
    // guard and must fall back to a rebuild under the new shape
    writeFile(leaf, "b.parquet", 400L, 500L)
    writeFile(leaf, "b2.parquet", 500L, 600L)
    staleAll()
    val r2 = Compactor.run(spark, lcRoot.getAbsolutePath, base.copy(matAggMinMax = Seq("amount")))
    r2.foreach(r => withClue(r) { r.success shouldBe true })
    val cols = MaterializedAgg.read(spark, aggPath).columns
    cols should contain allOf ("min_amount", "max_amount")
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))
  }

  test("GC'd history forces a full minMax rebuild, still exact") {
    val leaf = new File(root, "acct/source=mammgc/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mammgc").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 300L)
    commit(leafPath, "g1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))

    // GC'd inputs: the walk still classifies (producer ledger) and the
    // partials rebuild only needs the ADDED files — removed partials
    // drop by a name anti-join, no data read of the GC'd originals
    val recorded = ManifestCommit.liveFiles(spark, leafPath)
    commit(leafPath, "g2", recorded)
    recorded.foreach(p => new File(p).delete())

    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    r.mode shouldBe "walk"
    r.incremental shouldBe true
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))

    // checkpointed window + GC'd diff inputs → full minMax rebuild
    writeFile(leaf, "b.parquet", 300L, 500L)
    commit(leafPath, "g3", abs("b.parquet"))
    val live2 = ManifestCommit.liveFiles(spark, leafPath)
    commit(leafPath, "g4", live2)
    live2.foreach(p => new File(p).delete())
    ManifestCommit.checkpoint(spark, leafPath, beforeSeq = ManifestCommit.currentSeq(spark, leafPath))

    val r2 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    r2.mode shouldBe "rebuild"
    r2.incremental shouldBe false
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))
  }

  test("partials seal is O(delta): each refresh writes only the added files' generation") {
    val leaf = new File(root, "acct/source=pgen/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-pgen").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "p1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    val before = ManifestCommit.liveFiles(spark, leafPath).map(p => new File(p).getName).toSet

    writeFile(leaf, "b.parquet", 400L, 900L)
    commit(leafPath, "p2", abs("b.parquet"))
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))

    // the NEW generation holds ONLY the arrival commit's output — the
    // build's generation was carried by ledger reference, not rewritten
    val addedNames = ManifestCommit.liveFiles(spark, leafPath).map(p => new File(p).getName).toSet -- before
    val names = new File(aggPath).listFiles().map(_.getName)
    names.count(_.startsWith("pgen-")) shouldBe 2
    val newest = names.filter(_.startsWith("pgen-")).maxBy(_.stripPrefix("pgen-").toLong)
    val genFiles = spark.read.parquet(s"$aggPath/$newest")
      .select("_file").distinct().collect().map(f => new File(f.getString(0)).getName).toSet
    genFiles shouldBe addedNames
    genFiles should have size 1

    // a DELETE-WHERE rewrite: the dead files' rows stay in their
    // generations but the refold's live semi-join excludes them — the
    // max shrinks with zero history rewrite
    deleteWhereCommit(leaf, leafPath, "pdel", keepBelow = 700L)
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    val after = mmRows(MaterializedAgg.read(spark, aggPath))
    after shouldBe mmRows(fullAggMM(leafPath))
    after.map(_._5).max shouldBe 699L
  }

  test("generation sprawl folds into one past maxPartialGens; a planted stale row never resurrects") {
    val leaf = new File(root, "acct/source=pfold/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-pfold").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 100L)
    commit(leafPath, "f1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))

    // plant a STALE partial row (a file that never existed) claiming an
    // absurd max: the pre-generational layout needed a coverage
    // tripwire against this class; generational refolds exclude it
    // structurally via the live semi-join
    val s = spark
    import s.implicits._
    val gen0 = new File(aggPath).listFiles().map(_.getName).filter(_.startsWith("pgen-")).head
    Seq(("file:///nowhere/ghost.parquet", 0L, -999999L, 999999L))
      .toDF("_file", "k", "min_amount", "max_amount")
      .write.mode("append").parquet(s"$aggPath/$gen0")

    (2 to 4).foreach { i =>
      writeFile(leaf, s"f$i.parquet", i * 100L, i * 100L + 100L)
      commit(leafPath, s"fc$i", abs(s"f$i.parquet"))
      val r = MaterializedAgg.refresh(
        spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"), maxPartialGens = 2)
      r.incremental shouldBe true
      mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath)) // ghost never served
    }
    // at maxPartialGens=2 the chain must have folded: a single
    // generation remains, the ledger names exactly it, the ghost is gone
    val names = new File(aggPath).listFiles().map(_.getName)
    val gens = names.filter(_.startsWith("pgen-"))
    gens.length should be <= 2
    val ledger = java.nio.file.Files.readString(
      new File(aggPath).listFiles().find(_.getName.startsWith("pgens-")).get.toPath,
    ).split("\n").filter(_.nonEmpty).toSet
    gens.toSet shouldBe ledger
    val allFiles = gens.flatMap(g => spark.read.parquet(s"$aggPath/$g")
      .select("_file").distinct().collect().map(_.getString(0)))
    allFiles.exists(_.contains("ghost")) shouldBe false
  }

  test("a legacy partials-<seq> layout reads as one implicit generation and refreshes exactly") {
    val leaf = new File(root, "acct/source=plegacy/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-plegacy").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 300L)
    commit(leafPath, "l1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))

    // rewrite the store into the pre-generational shape: partials-<seq>
    // dir, no ledger — exactly what an old build left on disk
    val aggDir = new File(aggPath)
    val seq = aggDir.listFiles().map(_.getName).find(_.startsWith("pgens-")).get.stripPrefix("pgens-")
    val gen = aggDir.listFiles().map(_.getName).find(_.startsWith("pgen-")).get
    Files.move(new File(aggDir, gen).toPath, new File(aggDir, s"partials-$seq").toPath)
    new File(aggDir, s"pgens-$seq").delete() shouldBe true

    writeFile(leaf, "b.parquet", 300L, 600L)
    commit(leafPath, "l2", abs("b.parquet"))
    deleteWhereCommit(leaf, leafPath, "ldel", keepBelow = 500L)
    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    r.incremental shouldBe true
    val after = mmRows(MaterializedAgg.read(spark, aggPath))
    after shouldBe mmRows(fullAggMM(leafPath))
    after.map(_._5).max shouldBe 499L
    // the refreshed ledger carries the legacy dir by reference
    val ledger = java.nio.file.Files.readString(
      aggDir.listFiles().find(_.getName.startsWith("pgens-")).get.toPath,
    ).split("\n").filter(_.nonEmpty).toSet
    ledger should contain(s"partials-$seq")
  }

  // ---- merge-on-read delete sidecars ------------------------------------

  test("cnt/sum state refreshes through a MoR delete (walk reads only the sidecar's rows) and through its fold for free") {
    val leaf = new File(root, "acct/source=mamor/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-mor").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")

    writeFile(leaf, "a.parquet", 0L, 400L)
    commit(leafPath, "d1", abs("a.parquet"))
    writeFile(leaf, "b.parquet", 400L, 900L)
    commit(leafPath, "d2", abs("b.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"))

    // MoR delete: live DATA files unchanged, one sidecar appears — the
    // refresh must subtract exactly those rows (walk mode: the sidecar's
    // position join, never a whole-file re-read)
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("amount") % 10 === 0L, cfg)
      .get.success shouldBe true
    val r1 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    r1.mode shouldBe "walk"
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))

    // fold the sidecar physically — a walk-verified net-zero window.
    // PROOF of zero data read: corrupt every live byte before refreshing
    commit(leafPath, "d3", ManifestCommit.liveFiles(spark, leafPath))
    ManifestCommit.liveDeletes(spark, leafPath) shouldBe Seq.empty
    val before = rows(MaterializedAgg.read(spark, aggPath))
    val saved = ManifestCommit.liveFiles(spark, leafPath)
      .map(p => p -> Files.readAllBytes(new File(p).toPath)).toMap
    saved.keys.foreach(p => Files.write(new File(p).toPath, Array[Byte](0x13, 0x37)))
    val r2 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"))
    saved.foreach { case (p, b) => Files.write(new File(p).toPath, b) }
    r2.mode shouldBe "walk"
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe before
    rows(MaterializedAgg.read(spark, aggPath)) shouldBe rows(fullAgg(leafPath))
  }

  test("a build over a leaf with an outstanding sidecar is delete-aware; a state built before the delete catches up in diff mode too") {
    val leaf = new File(root, "acct/source=mamord/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")
    writeFile(leaf, "a.parquet", 0L, 500L)
    commit(leafPath, "e1", abs("a.parquet"))

    val aggOld = new File(root, "agg-mord-old").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggOld, Seq("k"), Seq("amount"))

    ManifestCommit.deleteWhereMoR(spark, leafPath, col("amount") >= 450L, cfg)
      .get.success shouldBe true

    // fresh build AFTER the delete: must aggregate the delete-aware read
    val aggNew = new File(root, "agg-mord-new").getAbsolutePath
    MaterializedAgg.build(spark, leafPath, aggNew, Seq("k"), Seq("amount"))
    rows(MaterializedAgg.read(spark, aggNew)) shouldBe rows(fullAgg(leafPath))

    // the pre-delete state catches up through the DIFF path (checkpoint
    // the log so the window cannot walk) — the sidecar shows up as an
    // added ledger entry whose rows subtract
    ManifestCommit.checkpoint(spark, leafPath, ManifestCommit.currentSeq(spark, leafPath)) should be >= 2
    val r = MaterializedAgg.refresh(spark, leafPath, aggOld, Seq("k"), Seq("amount"))
    r.mode shouldBe "diff"
    rows(MaterializedAgg.read(spark, aggOld)) shouldBe rows(fullAgg(leafPath))
  }

  test("minMax state rebuilds on sidecar movement and stops serving the deleted extreme") {
    val leaf = new File(root, "acct/source=mamorm/year=2026/month=01")
    leaf.mkdirs()
    val leafPath = leaf.getAbsolutePath
    val aggPath = new File(root, "agg-morm").getAbsolutePath
    def abs(ns: String*) = ns.map(n => s"$leafPath/$n")
    writeFile(leaf, "a.parquet", 0L, 600L)
    commit(leafPath, "f1", abs("a.parquet"))
    MaterializedAgg.build(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    mmRows(MaterializedAgg.read(spark, aggPath)).map(_._5).max shouldBe 599L

    // per-(file, group) partials cannot express a row-subset retraction
    // — the refresh must take the rebuild path and re-derive them
    // delete-aware, so the retracted max is never served again
    ManifestCommit.deleteWhereMoR(spark, leafPath, col("amount") >= 500L, cfg)
      .get.success shouldBe true
    val r = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    r.mode shouldBe "rebuild"
    val after = mmRows(MaterializedAgg.read(spark, aggPath))
    after shouldBe mmRows(fullAggMM(leafPath))
    after.map(_._5).max shouldBe 499L

    // the fold window moves the sidecar out again → rebuild again, and
    // thereafter (no sidecar movement) incremental refresh resumes
    commit(leafPath, "f2", ManifestCommit.liveFiles(spark, leafPath))
    MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
      .mode shouldBe "rebuild"
    writeFile(leaf, "g.parquet", 600L, 700L)
    commit(leafPath, "f3", abs("g.parquet"))
    val r3 = MaterializedAgg.refresh(spark, leafPath, aggPath, Seq("k"), Seq("amount"), minMax = Seq("amount"))
    r3.mode should (be("walk") or be("diff"))
    mmRows(MaterializedAgg.read(spark, aggPath)) shouldBe mmRows(fullAggMM(leafPath))
  }
}
