package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The r13 review-fix classes as PROPERTIES over the persisted stores
  * (ROADMAP 68): seeded randomized corpora and maintenance chains, not
  * single fixtures, for the contracts that rot silently —
  *
  *   - append-chain ≡ fresh-build screen equality through compaction
  *     (swap correctness), with hidden sidecars surviving the swap;
  *   - the crash-mid-swap window leaving an offline-rebuildable store
  *     (the documented gcOrphans-style contract);
  *   - no self-pairs on re-ingest screens (a doc absorbed earlier must
  *     never be flagged as a duplicate of itself);
  *   - random NSW maintenance chains preserving the node bag, the
  *     single-sealed-pointer invariant, and answer determinism, with
  *     injected crash debris never becoming visible.
  */
class StorePropertySpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-storeprop").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def docs = graft.Tables.documents(spark, sf).select("doc_id", "text")

  private def screenSet(probe: org.apache.spark.sql.DataFrame, path: String, sigBuckets: Int) =
    BandsStore.screen(spark, probe, path, sigBuckets = sigBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("property: append-chain + compact preserve the fresh-build screen under random splits (seeded)") {
    Seq(11, 12, 13).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val sigBuckets = if (rnd.nextBoolean()) 4 else 1
      val salt = rnd.nextInt(1000)
      // 4 deterministic pseudo-random groups: 3 absorbed in sequence, 1 held out as the probe
      def grp(i: Int) = docs.where(pmod(col("doc_id") * 37 + salt, lit(4)) === i)
      val chain = new File(root, s"bands-chain-$seed").getAbsolutePath
      val fresh = new File(root, s"bands-fresh-$seed").getAbsolutePath
      BandsStore.build(spark, grp(0), chain, sigBuckets = sigBuckets)
      BandsStore.append(spark, grp(1), chain, sigBuckets = sigBuckets)
      BandsStore.append(spark, grp(2), chain, sigBuckets = sigBuckets)
      BandsStore.build(spark, docs.where(pmod(col("doc_id") * 37 + salt, lit(4)) =!= 3), fresh, sigBuckets = sigBuckets)

      val probe = grp(3)
      val expected = screenSet(probe, fresh, sigBuckets)
      withClue(s"seed=$seed sigBuckets=$sigBuckets") {
        screenSet(probe, chain, sigBuckets) shouldBe expected

        // hidden sidecars (the .hs shingle sets of the streaming path)
        // live inside the store path and must survive the compact swap
        val sidecar = new File(chain, ".hs")
        sidecar.mkdirs()
        Files.writeString(new File(sidecar, "marker").toPath, "keep")
        BandsStore.compact(spark, chain)
        new File(sidecar, "marker").exists() shouldBe true
        screenSet(probe, chain, sigBuckets) shouldBe expected
        // idempotent: a second fold changes nothing
        BandsStore.compact(spark, chain)
        screenSet(probe, chain, sigBuckets) shouldBe expected
      }
    }
  }

  test("property: a crash mid-swap leaves a store the documented offline rebuild fully restores") {
    Seq(21, 22).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val salt = rnd.nextInt(1000)
      val path = new File(root, s"bands-crash-$seed").getAbsolutePath
      val corpus = docs.where(pmod(col("doc_id") + salt, lit(3)) =!= 0)
      val probe = docs.where(pmod(col("doc_id") + salt, lit(3)) === 0)
      BandsStore.build(spark, corpus, path)
      val expected = screenSet(probe, path, 1)

      // simulate the documented non-atomic window: the stage dir exists,
      // some band partitions are already deleted, the renames never ran
      val stage = new File(s"$path.compact-stage")
      spark.read.parquet(path).repartition(col("band"))
        .write.mode("overwrite").partitionBy("band").parquet(stage.getAbsolutePath)
      val bands = new File(path).listFiles().filter(_.getName.startsWith("band=")).sortBy(_.getName)
      bands.take(2).foreach { d =>
        def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
        rm(d)
      }
      // degraded but never WRONG: the partial store can only lose pairs
      val partial = screenSet(probe, path, 1)
      withClue(s"seed=$seed") {
        partial.subsetOf(expected) shouldBe true
        // the offline contract: rebuild from the corpus restores exactly
        BandsStore.build(spark, corpus, path)
        screenSet(probe, path, 1) shouldBe expected
      }
      def rm(f: File): Unit = { if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); () }
      rm(stage)
    }
  }

  test("property: re-ingest screens never self-pair, with and without sig buckets") {
    Seq(1, 4).foreach { sigBuckets =>
      val path = new File(root, s"bands-reingest-$sigBuckets").getAbsolutePath
      BandsStore.build(spark, docs, path, sigBuckets = sigBuckets)
      // screen a batch that is ENTIRELY already absorbed: every row of it
      // collides with its own stored bands, and without the id guard each
      // would be flagged as its own duplicate
      val probe = docs.where(col("doc_id") % 4 === 1)
      val got = screenSet(probe, path, sigBuckets)
      withClue(s"sigBuckets=$sigBuckets") {
        got.count { case (n, o) => n == o } shouldBe 0
        // and the guard loses nothing: the distinct-id candidates are
        // exactly the band-collision pairs computed independently
        val bands = graft.queries.DedupQueries.minhashBands(spark, docs, 4)
        val probeIds = probe.select("doc_id").collect().map(_.getLong(0)).toSet
        val expected = bands.as("x")
          .join(bands.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
            col("x.doc_id") =!= col("y.doc_id"))
          .select(col("x.doc_id").as("n"), col("y.doc_id").as("o"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
          .filter { case (n, _) => probeIds.contains(n) }.toSet
        got shouldBe expected
      }
    }
  }

  test("property: random NSW maintenance chains keep the node bag, one sealed pointer, deterministic answers (seeded)") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).cache()
    try {
      Seq(31, 32).foreach { seed =>
        val rnd = new scala.util.Random(seed)
        val path = new File(root, s"nsw-chain-$seed").getAbsolutePath
        NswSearch.buildIndex(e.where(col("vec_id") < 300).repartition(3), path)
        val inserted = scala.collection.mutable.Set.empty[Long] ++ (0L until 300L)
        var nextId = 300L
        val queries = e.where(col("vec_id") < 10)
          .select(col("vec_id"), col("v"))
          .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
        def answers() = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 48)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

        (1 to 6).foreach { step =>
          rnd.nextInt(4) match {
            case 0 => // insert a batch of fresh ids
              val n = 5 + rnd.nextInt(40)
              val batch = e.where(col("vec_id") >= nextId && col("vec_id") < nextId + n)
                .select("vec_id", "label", "v")
              if (batch.count() > 0) {
                NswSearch.insertIndex(spark, path, batch)
                inserted ++= (nextId until math.min(nextId + n, 500L))
                nextId = math.min(nextId + n, 500L)
              }
            case 1 =>
              NswSearch.rebalanceIndex(spark, path, maxNodes = 60 + rnd.nextInt(200))
              ()
            case 2 =>
              NswSearch.compactIndex(spark, path)
            case _ => // crash debris: an unsealed higher version dir
              val junkSeq = NswSearch.shardOwners(spark, path).values.max + 1
              e.limit(20).select(col("vec_id"), col("label"), col("v"))
                .withColumn("ord", lit(0)).withColumn("nbrs", array().cast("array<int>"))
                .withColumn("part", (col("vec_id") % 2).cast("int"))
                .write.mode("overwrite").partitionBy("part")
                .parquet(s"$path/v$junkSeq")
          }
          withClue(s"seed=$seed step=$step") {
            // exactly one sealed pointer, whatever the chain did
            new File(path).listFiles().map(_.getName).count(_.startsWith("_current-")) shouldBe 1
            // node bag: nothing lost, nothing duplicated, debris invisible
            NswSearch.readIndex(spark, path).select("vec_id").collect()
              .map(_.getLong(0)).sorted shouldBe inserted.toSeq.sorted
            // same chain state -> same answers, twice
            answers() shouldBe answers()
          }
        }
        // the surviving index still answers at the family's recall floor
        val exact = AnnSearch.exact(e.where(col("vec_id") < nextId), 0L until 10L, 5)
        val got = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
        AnnSearch.recallAt(exact, got, 0L until 10L, 5) should be >= 0.8
      }
    } finally { e.unpersist(); () }
  }
}
