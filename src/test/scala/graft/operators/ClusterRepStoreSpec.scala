package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** The incremental cluster-representative store must converge to the
  * one-shot `dedup_cluster_rep` answer on the unioned corpus for ANY
  * batch split, and its changefeed must fold exactly to the kept state —
  * the two contracts that let a 100-TB pipeline maintain keep-best dedup
  * per ingest instead of re-clustering the corpus.
  */
class ClusterRepStoreSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-crep").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def dir(name: String) = new File(root, name).getAbsolutePath

  private def realDocs: DataFrame =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"), col("n_chars").cast("long").as("quality"))

  /** The one-shot reference: the dedup_cluster_rep query body over an
    * arbitrary (doc_id, text, quality) corpus.
    */
  private def oneShot(docs: DataFrame): DataFrame = {
    val pairs = graft.queries.DedupQueries.minhashPairsOf(spark, docs)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = ConnectedComponents.minLabel(pairs).select(col("node").as("doc_id"), col("label"))
    val w = Window.partitionBy("cluster").orderBy(desc("quality"), col("doc_id"))
    docs.select("doc_id", "quality")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("label"), col("doc_id")))
      .withColumn("keep", when(row_number().over(w) === 1, 1).otherwise(0))
      .select(col("doc_id"), col("cluster"), col("keep"))
  }

  private def rows(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("any randomized split folds to the one-shot answer, deterministically") {
    val docs = realDocs.cache()
    val split = pmod(crc32(concat(col("doc_id").cast("string"), lit("|s84")).cast("binary")), lit(3L))
    val path = dir("rand3")
    (0L to 2L).foreach { b =>
      ClusterRepStore.update(spark, path, docs.where(split === b))
    }
    val got = rows(ClusterRepStore.assignment(spark, path))
    val want = rows(oneShot(docs))
    got shouldBe want

    // same batches, fresh store: bit-identical state (determinism)
    val path2 = dir("rand3b")
    (0L to 2L).foreach { b =>
      ClusterRepStore.update(spark, path2, docs.where(split === b))
    }
    rows(ClusterRepStore.assignment(spark, path2)) shouldBe got
    docs.unpersist()
    ()
  }

  test("the changefeed folds exactly to the kept pairs — no orphan retracts, no re-asserts") {
    val path = dir("rand3") // built by the previous test's 3-batch history
    val feed = ClusterRepStore.feed(spark, path)
      .select(col("op"), col("doc_id"), col("cluster")).collect()
    val asserts = feed.filter(_.getString(0) == "assert").map(r => (r.getLong(1), r.getLong(2)))
    val retracts = feed.filter(_.getString(0) == "retract").map(r => (r.getLong(1), r.getLong(2)))
    asserts.length shouldBe asserts.toSet.size // a pair is asserted at most once
    retracts.length shouldBe retracts.toSet.size
    retracts.toSet.subsetOf(asserts.toSet) shouldBe true // retraction implies a prior assert
    val folded = asserts.toSet -- retracts.toSet
    val kept = ClusterRepStore.assignment(spark, path).where(col("keep") === 1)
      .select("doc_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    folded shouldBe kept
  }

  private def words(seed: Int, n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"$tag${new scala.util.Random(seed * 1000 + i).alphanumeric.take(6).mkString}")

  test("a better late arrival displaces the stored keeper: retract + assert") {
    val t = words(1, 20, "w").mkString(" ") // identical texts collide in every band
    val b1 = spark.createDataFrame(Seq((10L, t, 5L), (20L, t, 9L))).toDF("doc_id", "text", "quality")
    val b2 = spark.createDataFrame(Seq((30L, t, 50L))).toDF("doc_id", "text", "quality")
    val path = dir("displace")
    ClusterRepStore.update(spark, path, b1)
    val feed2 = ClusterRepStore.update(spark, path, b2)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    feed2 shouldBe Set(("retract", 20L, 10L), ("assert", 30L, 10L))
    rows(ClusterRepStore.assignment(spark, path)) shouldBe
      Set((10L, 10L, 0), (20L, 10L, 0), (30L, 10L, 1))
  }

  /** Driver-side replica of the MinHash banding kernel (md5 32-bit
    * slice, 16 affine perms, 4 rows/band) — only to SEARCH for a
    * fixture; the test itself runs the real kernel through the store.
    */
  private def bandsOf(text: String): Seq[String] = {
    val ws = text.split(" ")
    val hs = (0 to ws.length - 3)
      .map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}").distinct
      .map { sh =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map(b => f"$b%02x").mkString.take(8)
        java.lang.Long.parseLong(hex, 16)
      }
    val mh = graft.queries.DedupQueries.perms.map { case (a, b) => hs.map(h => (h * a + b) % 4294967296L).min }
    (0 until 4).map(bi => (0 until 4).map(j => mh(bi * 4 + j)).mkString("|"))
  }

  private def collide(t1: String, t2: String): Boolean =
    bandsOf(t1).zip(bandsOf(t2)).exists { case (p, q) => p == q }

  test("a bridging doc merges two stored clusters and relabels through the alias") {
    // x = B, y = C (disjoint word sets — never collide), n = B+C: the
    // bridge shares half its shingles with each side, so a band
    // collision on BOTH sides is seed-dependent (J ≈ 0.5 per side) —
    // the driver-side kernel replica finds the first seed where the
    // triple holds; the merge then arrives ONLY through the new doc,
    // exactly the edge stored pairs can never produce
    val (x, y, n) = (0 until 500).iterator
      .map { k =>
        val bw = words(1000 + k, 12, "b"); val cw = words(2000 + k, 12, "c")
        (bw.mkString(" "), cw.mkString(" "), (bw ++ cw).mkString(" "))
      }
      .find { case (tx, ty, tn) => collide(tx, tn) && collide(ty, tn) && !collide(tx, ty) }
      .getOrElse(fail("no bridging triple in 500 seeds"))
    val b1 = spark.createDataFrame(Seq((100L, x, 1L), (200L, y, 9L))).toDF("doc_id", "text", "quality")
    val b2 = spark.createDataFrame(Seq((300L, n, 5L))).toDF("doc_id", "text", "quality")
    val path = dir("merge")
    val feed1 = ClusterRepStore.update(spark, path, b1)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    feed1 shouldBe Set(("assert", 100L, 100L), ("assert", 200L, 200L)) // two singletons: x !~ y
    val feed2 = ClusterRepStore.update(spark, path, b2)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // merged under label 100; y keeps on quality; both singleton keeps end
    feed2 shouldBe Set(("retract", 100L, 100L), ("retract", 200L, 200L), ("assert", 200L, 100L))
    rows(ClusterRepStore.assignment(spark, path)) shouldBe
      Set((100L, 100L, 0), (200L, 100L, 1), (300L, 100L, 0))
    rows(ClusterRepStore.assignment(spark, path)) shouldBe rows(oneShot(b1.unionByName(b2)))
  }

  test("a crashed attempt's unsealed debris is swept, never double-counted") {
    val t = words(2, 20, "v").mkString(" ")
    val b1 = spark.createDataFrame(Seq((10L, t, 5L), (20L, t, 9L))).toDF("doc_id", "text", "quality")
    val b2 = spark.createDataFrame(Seq((30L, t, 50L))).toDF("doc_id", "text", "quality")
    val path = dir("crashed")
    ClusterRepStore.update(spark, path, b1)
    // fake a crashed sq=2 attempt: junk members/bands/alias beyond the pointer
    spark.createDataFrame(Seq((10L, 999L, 10L, 0), (20L, 999L, 20L, 1)))
      .toDF("doc_id", "quality", "orig", "db")
      .write.partitionBy("db").parquet(s"$path/members/sq=2")
    graft.queries.DedupQueries.minhashBands(spark, b1)
      .write.partitionBy("band").parquet(s"$path/bands/sq=2")
    spark.createDataFrame(Seq((99L, 98L))).toDF("orig", "canon").write.parquet(s"$path/alias-2")
    // the unsealed debris is invisible to readers and swept by the redo
    val got = ClusterRepStore.update(spark, path, b2)
    got.count() should be > 0L
    rows(ClusterRepStore.assignment(spark, path)) shouldBe
      Set((10L, 10L, 0), (20L, 10L, 0), (30L, 10L, 1))
  }

  test("exactly one sealed pointer; superseded alias/keeper state reclaimed; feed history retained") {
    val path = dir("rand3")
    val names = new File(path).listFiles().map(_.getName).toSet
    names.count(_.startsWith("_current-")) shouldBe 1
    names should contain("_current-3")
    names.filter(_.startsWith("alias-")) shouldBe Set("alias-3")
    names.filter(_.startsWith("keepers-")) shouldBe Set("keepers-3")
    new File(s"$path/feed").listFiles().map(_.getName).filter(_.startsWith("sq=")).toSet shouldBe
      Set("sq=1", "sq=2", "sq=3")
  }

  test("compact folds the add-log generations probe-equally and keeps the feed history") {
    val path = dir("rand3") // the 3-batch store from the first test
    val before = rows(ClusterRepStore.assignment(spark, path))
    ClusterRepStore.generationCount(spark, path) shouldBe 3L
    ClusterRepStore.compact(spark, path)
    ClusterRepStore.generationCount(spark, path) shouldBe 1L
    rows(ClusterRepStore.assignment(spark, path)) shouldBe before
    // folded-away generations reclaimed; feed history (the public log) intact
    new File(s"$path/members").listFiles().map(_.getName).filter(_.startsWith("sq=")).toSet shouldBe Set("sq=4")
    new File(s"$path/bands").listFiles().map(_.getName).filter(_.startsWith("sq=")).toSet shouldBe Set("sq=4")
    new File(s"$path/feed").listFiles().map(_.getName).filter(_.startsWith("sq=")).toSet shouldBe
      Set("sq=1", "sq=2", "sq=3")
    // the folded store keeps absorbing: a displacing arrival still
    // screens against the folded bands and updates the folded members
    val anyKept = ClusterRepStore.assignment(spark, path).where(col("keep") === 1)
      .orderBy("doc_id").limit(1).collect().head
    val (kd, kc) = (anyKept.getLong(0), anyKept.getLong(1))
    val kt = graft.Tables.documents(spark, sf).where(col("doc_id") === kd)
      .select("text").collect().head.getString(0)
    val huge = spark.createDataFrame(Seq((900000L, kt, 1000000L))).toDF("doc_id", "text", "quality")
    val feedN = ClusterRepStore.update(spark, path, huge)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    feedN should contain(("retract", kd, kc))
    feedN should contain(("assert", 900000L, kc))
  }

  /** Sticky-retraction reference: components over ALL docs (dead edges
    * included), representatives ranked among survivors only.
    */
  private def oneShotSurvivors(docs: DataFrame, gone: Set[Long]): Set[(Long, Long, Int)] = {
    val pairs = graft.queries.DedupQueries.minhashPairsOf(spark, docs)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val comp = ConnectedComponents.minLabel(pairs).select(col("node").as("doc_id"), col("label"))
    val w = Window.partitionBy("cluster").orderBy(desc("quality"), col("doc_id"))
    rows(
      docs.select("doc_id", "quality")
        .join(comp, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("label"), col("doc_id")))
        .where(!col("doc_id").isin(gone.toSeq: _*))
        .withColumn("keep", when(row_number().over(w) === 1, 1).otherwise(0))
        .select(col("doc_id"), col("cluster"), col("keep")))
  }

  test("retract recomputes a dead keeper among survivors and retracts dying singletons") {
    val t = words(5, 20, "r").mkString(" ")
    val u = words(6, 20, "s").mkString(" ")
    // cluster {10,20,30} keeper 20 (q9); singleton 40
    val b1 = spark.createDataFrame(Seq((10L, t, 5L), (20L, t, 9L), (30L, t, 7L), (40L, u, 3L)))
      .toDF("doc_id", "text", "quality")
    val path = dir("retract")
    ClusterRepStore.update(spark, path, b1)
    val gone = spark.createDataFrame(Seq(Tuple1(20L), Tuple1(40L))).toDF("doc_id")
    val feed = ClusterRepStore.retract(spark, path, gone)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    feed shouldBe Set(("retract", 20L, 10L), ("assert", 30L, 10L), ("retract", 40L, 40L))
    rows(ClusterRepStore.assignment(spark, path)) shouldBe
      Set((10L, 10L, 0), (30L, 10L, 1)) // dead docs gone; 30 (q7) beats 10 (q5)

    // replay: the same retraction again is a no-op feed, state unchanged
    ClusterRepStore.retract(spark, path, gone).count() shouldBe 0L
    rows(ClusterRepStore.assignment(spark, path)) shouldBe Set((10L, 10L, 0), (30L, 10L, 1))
  }

  test("sticky components: a near-dup of a DEAD doc still joins its historical cluster") {
    val t = words(7, 20, "z").mkString(" ")
    val b1 = spark.createDataFrame(Seq((10L, t, 5L), (20L, t, 9L))).toDF("doc_id", "text", "quality")
    val path = dir("sticky")
    ClusterRepStore.update(spark, path, b1)
    // kill the whole cluster
    ClusterRepStore.retract(spark, path, spark.createDataFrame(Seq(Tuple1(10L), Tuple1(20L))).toDF("doc_id"))
    ClusterRepStore.assignment(spark, path).count() shouldBe 0L
    // a later arrival with the same text revives the HISTORICAL label 10
    val b2 = spark.createDataFrame(Seq((90L, t, 2L))).toDF("doc_id", "text", "quality")
    val feed = ClusterRepStore.update(spark, path, b2)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    feed shouldBe Set(("assert", 90L, 10L))
    rows(ClusterRepStore.assignment(spark, path)) shouldBe Set((90L, 10L, 1))
  }

  test("randomized ingest + retraction history folds to the all-docs/survivor-rank reference") {
    val docs = realDocs.cache()
    val split = pmod(crc32(concat(col("doc_id").cast("string"), lit("|r89")).cast("binary")), lit(2L))
    val path = dir("randret")
    (0L to 1L).foreach(b => ClusterRepStore.update(spark, path, docs.where(split === b)))
    val gone = docs.where(col("doc_id") % 5 === 2).select("doc_id")
    ClusterRepStore.retract(spark, path, gone)
    val goneSet = gone.collect().map(_.getLong(0)).toSet
    rows(ClusterRepStore.assignment(spark, path)) shouldBe oneShotSurvivors(docs, goneSet)

    // compaction folds the add-log but keeps the tombstones effective
    ClusterRepStore.compact(spark, path)
    rows(ClusterRepStore.assignment(spark, path)) shouldBe oneShotSurvivors(docs, goneSet)
    docs.unpersist()
    ()
  }

  test("the matched-member lookup is a static-partition-pruned read of the doc buckets") {
    // docs 11 (bucket 7) and 12 (bucket 13) under crc32 % 16; the new
    // batch matches ONLY 11, so only db=7 may be read — proven by
    // corrupting db=13's parquet bytes: an unpruned lookup would fail,
    // the pruned one never opens the file
    val t = words(3, 20, "p").mkString(" ")
    val tt = words(4, 20, "q").mkString(" ")
    val b1 = spark.createDataFrame(Seq((11L, t, 5L), (12L, tt, 5L))).toDF("doc_id", "text", "quality")
    val path = dir("pruned")
    ClusterRepStore.update(spark, path, b1)
    val other = new File(s"$path/members/sq=1/db=13")
    other.isDirectory shouldBe true
    other.listFiles().filter(_.getName.endsWith(".parquet")).foreach { f =>
      Files.write(f.toPath, "not parquet".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val b2 = spark.createDataFrame(Seq((22L, t, 50L))).toDF("doc_id", "text", "quality")
    val feed2 = ClusterRepStore.update(spark, path, b2)
      .select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    feed2 shouldBe Set(("retract", 11L, 11L), ("assert", 22L, 11L))
  }
}
