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
  * batches as a scan + one grouping shuffle.
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

  test("searchIndex over a persisted index equals nsw built fresh on the same partitioning") {
    val e = graft.queries.SimilarityQueries.vecs(spark, sf).repartition(3).cache()
    try {
      val qids = 0L until 12L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

      val path = new File(root, "nsw-index").getAbsolutePath
      NswSearch.buildIndex(e, path, m = 8, efBuild = 24)
      // index layout sanity: hive-partitioned by graph shard
      new File(path).listFiles().map(_.getName).count(_.startsWith("part=")) shouldBe 3

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
      val nBase = spark.read.parquet(path).count()

      // single-doc insert touches exactly ONE shard: the other shard
      // partitions keep their files byte-for-byte
      val one = late.where(col("vec_id") === 400)
      val filesBefore = new File(path).listFiles().filter(_.getName.startsWith("part="))
        .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.length())).toSet).toMap
      NswSearch.insertIndex(spark, path, one)
      val filesAfter = new File(path).listFiles().filter(_.getName.startsWith("part="))
        .map(d => d.getName -> d.listFiles().map(f => (f.getName, f.length())).toSet).toMap
      val changed = filesBefore.keys.filter(k => filesBefore(k) != filesAfter(k))
      changed.size shouldBe 1
      spark.read.parquet(path).count() shouldBe nBase + 1

      // bulk insert the rest; every vector is present and searchable at
      // the same recall floor as a fresh build
      NswSearch.insertIndex(spark, path, late.where(col("vec_id") > 400))
      spark.read.parquet(path).count() shouldBe e.count()
      spark.read.parquet(path).select("vec_id").distinct().count() shouldBe e.count()

      val qids = 0L until 20L
      val queries = e.where(col("vec_id").isin(qids: _*))
        .select(col("vec_id"), col("v"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      val exact = AnnSearch.exact(e, qids, 5)
      val ann = NswSearch.searchIndex(spark, path, queries, k = 5, efSearch = 64)
      AnnSearch.recallAt(exact, ann, qids, 5) should be >= 0.8
    } finally {
      e.unpersist()
      ()
    }
  }
}
