package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The persisted NSW index must be a pure cache of the build: searching
  * it returns EXACTLY what building fresh on the same partitioning
  * returns — the equivalence that lets a production pipeline pay the
  * O(n·efBuild·M) graph construction once and amortize it across query
  * batches as a scan + one grouping shuffle. And it must carry the
  * versioned-pointer crash contract of every sibling store: a writer
  * dying at ANY point before the `_current-<seq>` seal leaves the
  * previous version live and search-identical.
  */
class NswIndexSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-nsw").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  /** Concrete live files per shard, resolved through the sealed map —
    * the isolation checks compare these across maintenance calls.
    */
  private def liveShardFiles(path: String): Map[Int, Set[(String, Long)]] =
    NswSearch.shardOwners(spark, path).map { case (shard, owner) =>
      val dir = new File(s"$path/v$owner/part=$shard")
      shard -> dir.listFiles().map(f => (f.getAbsolutePath, f.length())).toSet
    }

  test("searchIndex over a persisted index equals nsw built fresh on the same partitioning") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).repartition(3).cache()
    try {
      val qids = 0L until 12L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

      val path = new File(root, "nsw-index").getAbsolutePath
      NswSearch.buildIndex(e, path, m = 8, efBuild = 24)
      // versioned layout sanity: sealed pointer + one version owning 3 shards
      new File(path).listFiles().map(_.getName).count(_.startsWith("_current-")) shouldBe 1
      NswSearch.shardOwners(spark, path).keySet shouldBe Set(0, 1, 2)

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val fresh = rows(NswSearch.nsw(e, qids, k = 5, m = 8, efSearch = 48, efBuild = 24))
      val fromIndex = rows(NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 48, m = 8))
      fromIndex shouldBe fresh
      fromIndex.nonEmpty shouldBe true

      // a second batch reuses the same index without rebuilding — and a
      // narrower beam still answers from it
      val fromIndex2 = rows(NswSearch.searchIndex(spark, path, queries.take(3), k = 5, efSearch = 16))
      fromIndex2.map(_._1) shouldBe queries.take(3).map(_._1).toSet

      // a REBUILD bumps the version and reclaims the old one
      NswSearch.buildIndex(e, path, m = 8, efBuild = 24)
      new File(path).listFiles().map(_.getName).count(_.startsWith("_current-")) shouldBe 1
      new File(path).listFiles().map(_.getName).count(_.startsWith("v")) shouldBe 1
      rows(NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 48, m = 8)) shouldBe fresh
    } finally {
      e.unpersist()
      ()
    }
  }

  test("insertIndex grows the index incrementally, rewriting only touched shards") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).cache()
    try {
      val path = new File(root, "nsw-incr").getAbsolutePath
      val base = e.where(col("vec_id") < 400).repartition(4)
      val late = e.where(col("vec_id") >= 400)
      NswSearch.buildIndex(base, path, m = 8, efBuild = 24)
      val nBase = NswSearch.readIndex(spark, path).count()

      // single-doc insert touches exactly ONE shard: every other shard
      // keeps its live files byte-for-byte (same concrete paths — the
      // versioned map re-points only the rewritten shard)
      val one = late.where(col("vec_id") === 400)
      val filesBefore = liveShardFiles(path)
      NswSearch.insertIndex(spark, path, one)
      val filesAfter = liveShardFiles(path)
      val changed = filesBefore.keys.filter(k => filesBefore(k) != filesAfter(k))
      changed.size shouldBe 1
      NswSearch.readIndex(spark, path).count() shouldBe nBase + 1

      val qids = 0L until 20L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

      // compactIndex folds the version chain (the single-doc insert left
      // live shards split across two version dirs): one version dir
      // afterwards, same node bag, same answers
      NswSearch.versionSpread(spark, path) shouldBe 2
      val preCompact = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      NswSearch.compactIndex(spark, path)
      NswSearch.versionSpread(spark, path) shouldBe 1
      new File(path).listFiles().map(_.getName).count(_.startsWith("v")) shouldBe 1
      NswSearch.readIndex(spark, path).count() shouldBe nBase + 1
      NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
        .select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe preCompact

      // bulk insert the rest; every vector is present and searchable at
      // the same recall floor as a fresh build
      NswSearch.insertIndex(spark, path, late.where(col("vec_id") > 400))
      NswSearch.readIndex(spark, path).count() shouldBe e.count()
      NswSearch.readIndex(spark, path).select("vec_id").distinct().count() shouldBe e.count()

      val exact = AnnSearch.exact(e, qids, 5)
      val ann = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
      AnnSearch.recallAt(exact, ann, qids, 5) should be >= 0.8
    } finally {
      e.unpersist()
      ()
    }
  }

  test("centroid-routed shards: nprobe << nShards probes, pruned scan, recall floor, routed inserts") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).cache()
    try {
      val path = new File(root, "nsw-routed").getAbsolutePath
      NswSearch.buildIndexRouted(e, path, nShards = 8, m = 8, efBuild = 24, lloydIters = 2, seedIds = Some(1L to 8L))
      // layout: centroids sealed INSIDE the version dir; <= nShards shards
      val owners = NswSearch.shardOwners(spark, path)
      new File(s"$path/v${owners.values.head}/_centroids").exists() shouldBe true
      owners.size should be <= 8
      owners.size should be > 1

      val qids = 0L until 20L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

      // ONE query with nprobe=2 scans at most 2 shard partitions — the
      // partition-pruning property hash routing cannot have
      val one = NswSearch.searchIndexRouted(spark, path, queries.take(1), k = 5, efSearch = 64, nprobe = 2)
      val scannedParts = one.queryExecution.executedPlan.collectLeaves().flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f.relation.location.inputFiles.toSeq
        case _ => Seq.empty
      }.flatMap(p => "part=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt)).distinct
      withClue(s"scanned shards: $scannedParts") { scannedParts.size should be <= 2 }

      // recall ladder at nprobe << nShards: the clustered fixture routes
      // each query's neighborhood into few shards (measured 0.68 at 2/8
      // probes — a 4x scan cut; probing half the shards restores the
      // all-shard 0.8 floor). Monotone by construction: a true top-k
      // member found in any probed shard always survives the sim-ordered
      // merge, so more probes never lose recall.
      val exact = AnnSearch.exact(e, qids, 5)
      val routed = NswSearch.searchIndexRouted(spark, path, queries, k = 5, efSearch = 64, nprobe = 2)
      val recall2 = AnnSearch.recallAt(exact, routed, qids, 5)
      val recall4 = AnnSearch.recallAt(
        exact, NswSearch.searchIndexRouted(spark, path, queries, k = 5, efSearch = 64, nprobe = 4), qids, 5)
      recall2 should be >= 0.6
      recall4 should be >= recall2
      recall4 should be >= 0.8

      // probing EVERY shard must equal the probe-everything reader on the
      // same files: routing changes which shards are visited, never what
      // a visited shard answers
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("qid", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      rows(NswSearch.searchIndexRouted(spark, path, queries, k = 5, efSearch = 64, nprobe = 8)) shouldBe
        rows(NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64))

      // deterministic: same (index, queries, parameters) -> same rows
      rows(NswSearch.searchIndexRouted(spark, path, queries, k = 5, efSearch = 64, nprobe = 2)) shouldBe
        rows(routed)

      // routed insert: one new vector rewrites exactly one shard; every
      // other shard keeps its live files byte-for-byte
      val n0 = NswSearch.readIndex(spark, path).count()
      val before = liveShardFiles(path)
      NswSearch.insertIndexRouted(spark, path,
        spark.createDataFrame(Seq((8001L, "z", Array.fill(64)(0.25)))).toDF("vec_id", "label", "v"))
      val after = liveShardFiles(path)
      before.keys.count(kk => before(kk) != after.getOrElse(kk, Set.empty)) shouldBe 1
      NswSearch.readIndex(spark, path).count() shouldBe n0 + 1
    } finally { e.unpersist(); () }
  }

  test("crash matrix: a writer dying before the seal leaves the old version live and search-identical") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).cache()
    try {
      val path = new File(root, "nsw-crash").getAbsolutePath
      NswSearch.buildIndexRouted(e, path, nShards = 8, m = 8, efBuild = 24, lloydIters = 1, seedIds = Some(1L to 8L))
      val qids = 0L until 10L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      def answers() = NswSearch.searchIndexRouted(spark, path, queries, k = 5, efSearch = 64, nprobe = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val sealedSeq = NswSearch.shardOwners(spark, path).values.max
      val good = answers()
      val goodFiles = liveShardFiles(path)

      // CRASH WINDOW 1 — buildIndexRouted killed between the shard write
      // and the centroid write: a complete-looking v<seq+1> shard tree
      // with NO centroids, NO map, NO pointer. Readers must not see it.
      val partial = s"$path/v${sealedSeq + 1}"
      e.limit(50).select(col("vec_id"), col("label"), col("v"))
        .withColumn("ord", lit(0)).withColumn("nbrs", array().cast("array<int>"))
        .withColumn("part", (col("vec_id") % 3).cast("int"))
        .write.mode("overwrite").partitionBy("part").parquet(partial)
      answers() shouldBe good
      liveShardFiles(path) shouldBe goodFiles

      // CRASH WINDOW 2 — killed after the centroid write too (everything
      // but the map + pointer): still invisible.
      spark.read.parquet(s"$path/v$sealedSeq/_centroids")
        .limit(2).write.mode("overwrite").parquet(s"$partial/_centroids")
      answers() shouldBe good

      // CRASH WINDOW 3 — killed after the map write, before the pointer:
      // the pointer IS the commit; still invisible.
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$partial/_map"),
        s"centroids=${sealedSeq + 1}\nshard.0=${sealedSeq + 1}",
      )
      answers() shouldBe good

      // recovery: the next real writer reuses the seq, overwrites the
      // debris wholesale, and seals — the store is healthy again
      NswSearch.insertIndexRouted(spark, path,
        spark.createDataFrame(Seq((9501L, "z", Array.fill(64)(0.75)))).toDF("vec_id", "label", "v"))
      NswSearch.readIndex(spark, path).count() shouldBe e.count() + 1
      NswSearch.readIndex(spark, path).select("vec_id").distinct().count() shouldBe e.count() + 1
      // the once-partial seq is now sealed and consistent
      NswSearch.shardOwners(spark, path).values.max shouldBe sealedSeq + 1
    } finally { e.unpersist(); () }
  }

  test("rebalanceIndex splits oversized shards, leaves others untouched, and preserves recall") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).cache()
    try {
      val path = new File(root, "nsw-rebal").getAbsolutePath
      // a deliberately skewed layout: shard sizes ~420 / ~40 / ~40
      val skewed = e.repartitionByRange(3, col("vec_id") >= 420, col("vec_id") >= 460)
      NswSearch.buildIndex(skewed, path, m = 8, efBuild = 24)
      val sizes0 = NswSearch.readIndex(spark, path).groupBy("part").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      sizes0.values.max should be > 100L

      // within-bound rebalance is a no-op: nothing returned, nothing rewritten
      val before = liveShardFiles(path)
      NswSearch.rebalanceIndex(spark, path, maxNodes = 1000) shouldBe 0
      liveShardFiles(path) shouldBe before

      // split the big shard into <=100-node chunks; small shards keep their files
      val split = NswSearch.rebalanceIndex(spark, path, maxNodes = 100)
      split shouldBe sizes0.count(_._2 > 100)
      val after = liveShardFiles(path)
      val untouched = sizes0.filter(_._2 <= 100).keys.toSet
      untouched.foreach(p => after(p) shouldBe before(p))
      val sizes1 = NswSearch.readIndex(spark, path).groupBy("part").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      sizes1.values.max should be <= 100L
      // routing domain stays contiguous 0..nParts-1 for insertIndex
      sizes1.keySet shouldBe (0 until sizes1.size).toSet
      // node bag preserved exactly
      NswSearch.readIndex(spark, path).select("vec_id").collect().map(_.getLong(0)).sorted shouldBe
        e.select(col("vec_id")).collect().map(_.getLong(0)).sorted

      // the rebalanced index still answers at the recall floor, deterministically
      val qids = 0L until 20L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val exact = AnnSearch.exact(e, qids, 5)
      val a1 = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
      AnnSearch.recallAt(exact, a1, qids, 5) should be >= 0.8
      val a2 = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
      a1.collect().toSet shouldBe a2.collect().toSet

      // inserts keep working against the widened shard domain
      val n0 = NswSearch.readIndex(spark, path).count()
      NswSearch.insertIndex(spark, path,
        spark.createDataFrame(Seq((9001L, "z", Array.fill(64)(0.5)))).toDF("vec_id", "label", "v"))
      NswSearch.readIndex(spark, path).count() shouldBe n0 + 1

      // auto-rebalance: a bulk insert with rebalanceMax keeps every
      // shard within bound in the same call, with nothing lost
      NswSearch.insertIndex(spark, path,
        spark.createDataFrame((9100L until 9200L).map(i => (i, "w", Array.fill(64)(i / 9200.0))))
          .toDF("vec_id", "label", "v"),
        rebalanceMax = 60)
      val sizes2 = NswSearch.readIndex(spark, path).groupBy("part").count()
        .collect().map(r => r.getLong(1))
      sizes2.max should be <= 60L
      sizes2.sum shouldBe n0 + 1 + 100
    } finally {
      e.unpersist()
      ()
    }
  }
}
