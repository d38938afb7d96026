package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** The incremental (persisted-bands) cross-corpus dedup must find
  * EXACTLY the pairs the from-scratch `dedup_minhash_cross` shape finds
  * on the same corpus split — the equivalence that lets a production
  * pipeline screen each ingest batch against a bands table instead of
  * re-deriving the whole corpus's signatures per run.
  */
class BandsStoreSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-bands").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  // the same corpus split dedup_minhash_cross uses: source-id parity
  private def withParity: DataFrame =
    Tables.documents(spark, sf)
      .withColumn("parity", expr("CAST(substring(source, 4) AS INT)") % 2)
  private def history: DataFrame = withParity.where(col("parity") === 0).drop("parity")
  private def batch: DataFrame = withParity.where(col("parity") === 1).drop("parity")

  /** From-scratch expectation: both sides' bands derived in one run,
    * joined across sides only — the registered query's candidate stage.
    */
  private def fromScratchPairs: Set[(Long, Long)] = {
    val bands = graft.queries.DedupQueries.minhashBands(spark, Tables.fanout(Tables.documents(spark, sf)))
    val side = withParity.select("doc_id", "parity")
    val newB = bands.join(side.where(col("parity") === 1).drop("parity"), "doc_id")
    val oldB = bands.join(side.where(col("parity") === 0).drop("parity"), "doc_id")
    newB.as("x")
      .join(oldB.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
      .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("old_doc"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("screen(batch) against the persisted store equals the from-scratch cross-corpus pairs") {
    val store = new File(root, "bands1").getAbsolutePath
    BandsStore.build(spark, history, store)
    val got = BandsStore.screen(spark, batch, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = fromScratchPairs
    expected.nonEmpty shouldBe true // the fixture genuinely has cross-side near-dups
    got shouldBe expected
    // the store really is partitioned by band (scan prunes per band)
    new File(store).listFiles().map(_.getName).count(_.startsWith("band=")) shouldBe 4
  }

  test("a history built by build + append screens identically to one built in a single shot") {
    // history arrives in two ingest slices; the store accretes via
    // append — no rewrite — and the screen result is indistinguishable
    val h1 = history.where(col("doc_id") % 2 === 0)
    val h2 = history.where(col("doc_id") % 2 === 1)
    val accreted = new File(root, "bands2").getAbsolutePath
    BandsStore.build(spark, h1, accreted)
    BandsStore.append(spark, h2, accreted)
    val oneShot = new File(root, "bands3").getAbsolutePath
    BandsStore.build(spark, history, oneShot)
    val a = BandsStore.screen(spark, batch, accreted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = BandsStore.screen(spark, batch, oneShot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    a shouldBe b
    a.nonEmpty shouldBe true
  }

  test("compact folds append debris into one file per band, screen unchanged") {
    val store = new File(root, "bands-compact").getAbsolutePath
    val h1 = history.where(col("doc_id") % 3 === 0)
    val h2 = history.where(col("doc_id") % 3 === 1)
    val h3 = history.where(col("doc_id") % 3 === 2)
    BandsStore.build(spark, h1, store)
    BandsStore.append(spark, h2, store)
    BandsStore.append(spark, h3, store)

    def filesPerBand: Map[String, Int] =
      new File(store).listFiles().filter(_.getName.startsWith("band="))
        .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val before = filesPerBand
    withClue(before) { before.values.max should be > 1 }
    val resBefore = BandsStore.screen(spark, batch, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    BandsStore.compact(spark, store)

    val after = filesPerBand
    withClue(after) { after.values.max shouldBe 1 }
    after.keySet shouldBe before.keySet
    BandsStore.screen(spark, batch, store)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe resBefore
    resBefore.nonEmpty shouldBe true
  }

  test("sig-bucketed store screens identically and prunes the history scan to touched buckets") {
    val store = new File(root, "bands5").getAbsolutePath
    BandsStore.build(spark, history, store, sigBuckets = 8)
    // two partition levels on disk
    val bandDirs = new File(store).listFiles().filter(_.getName.startsWith("band="))
    bandDirs.length shouldBe 4
    all(bandDirs.map(_.listFiles().count(_.getName.startsWith("sigb=")))) should be >= 1

    // identical candidates to the flat store (sigb is a function of sig)
    val flat = new File(root, "bands6").getAbsolutePath
    BandsStore.build(spark, history, flat)
    def pairs(df: DataFrame) = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = BandsStore.screen(spark, batch, store, sigBuckets = 8)
    pairs(bucketed) shouldBe pairs(BandsStore.screen(spark, batch, flat))
    pairs(bucketed).nonEmpty shouldBe true

    // a one-doc batch touches few (band, sigb) combos -> the history
    // scan's partition filter prunes to those directories only
    val one = batch.limit(1)
    val oneScreen = BandsStore.screen(spark, one, store, sigBuckets = 8)
    oneScreen.count() // force planning + execution
    val plan = oneScreen.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("sigb")
    // bucketed append then screen still equals from-scratch on the union
    BandsStore.append(spark, batch.limit(0), store, sigBuckets = 8) // empty append is a no-op
    pairs(BandsStore.screen(spark, batch, store, sigBuckets = 8)) shouldBe pairs(BandsStore.screen(spark, batch, flat))
  }

  test("the batch pipeline never pairs batch docs with each other through the store") {
    val store = new File(root, "bands4").getAbsolutePath
    BandsStore.build(spark, history, store)
    val batchIds = batch.select("doc_id").collect().map(_.getLong(0)).toSet
    val got = BandsStore.screen(spark, batch, store).collect()
    got.foreach { r =>
      batchIds should contain(r.getLong(0))
      batchIds should not contain r.getLong(1)
    }
  }
}
