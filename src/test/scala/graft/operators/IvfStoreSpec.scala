package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** The persisted IVF store must be a pure cache of the train+assign
  * passes: searching it returns EXACTLY what [[AnnSearch.ivf]] computes
  * when it re-trains and re-assigns per batch — the equivalence that
  * lets a production pipeline pay the Lloyd training and the
  * full-corpus assignment once, then answer every query batch with a
  * partition-pruned scan of the probed lists.
  */
class IvfStoreSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-ivf").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def vecs = graft.queries.SimilarityQueries.vecs(spark, sf)

  private def queriesFor(e: org.apache.spark.sql.DataFrame, qids: Seq[Long]) =
    e.where(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("qid", "vec_id", "sim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("search over a persisted store equals AnnSearch.ivf at the same parameters") {
    val e = vecs.cache()
    try {
      val qids = 1L to 10L
      val path = new File(root, "ivf-a").getAbsolutePath
      // seedIds 1..16 = AnnSearch.ivf's seeding rule, for exact parity
      IvfStore.build(e, path, nCentroids = 16, lloydIters = 2, seedIds = Some(1L to 16L))

      // store layout sanity: sealed version dir + pointer, one hive
      // partition per inverted list
      new File(path, "_current-1").exists() shouldBe true
      new File(path, "v1/lists").listFiles().map(_.getName).count(_.startsWith("cid=")) should be > 1

      val fresh = rows(AnnSearch.ivf(e, qids, k = 5, nCentroids = 16, nprobe = 2, lloydIters = 2))
      val stored = rows(IvfStore.search(spark, path, queriesFor(e, qids), k = 5, nprobe = 2))
      stored shouldBe fresh
      stored.nonEmpty shouldBe true
    } finally { e.unpersist(); () }
  }

  test("the probe scan prunes to the probed list partitions") {
    val e = vecs
    val path = new File(root, "ivf-prune").getAbsolutePath
    IvfStore.build(e, path, nCentroids = 16, lloydIters = 1)
    val res = IvfStore.search(spark, path, queriesFor(e, Seq(3L)), k = 5, nprobe = 2)
    // one query probing nprobe=2 lists must read at most 2 of the 16
    // list directories: the cid filter is a partition filter, and the
    // scan's leaf files all live under the probed cid= directories
    val scans = res.queryExecution.executedPlan.collectLeaves()
    val files = scans.flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.toSeq
      case _ => Seq.empty
    }
    val listFiles = files.filter(_.contains("/lists/"))
    val cids = listFiles.flatMap { p =>
      "cid=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt)
    }.distinct
    withClue(s"scanned cids: $cids") { cids.size should be <= 2 }
  }

  test("append assigns against the frozen codebook; incremental equals one-shot") {
    val e = vecs.cache()
    try {
      val (histDf, batchDf) = (e.where(col("vec_id") % 3 =!= 0), e.where(col("vec_id") % 3 === 0))
      val qids = Seq(2L, 5L, 9L, 12L)

      // two stores, same history codebook: one appends the batch in one
      // call, the other in two — append must be deterministic and
      // history-independent (frozen codebook, no history reads)
      val p1 = new File(root, "ivf-inc1").getAbsolutePath
      val p2 = new File(root, "ivf-inc2").getAbsolutePath
      IvfStore.build(histDf, p1, nCentroids = 8, lloydIters = 1)
      IvfStore.build(histDf, p2, nCentroids = 8, lloydIters = 1)
      IvfStore.append(spark, batchDf, p1)
      IvfStore.append(spark, batchDf.where(col("vec_id") % 2 === 0), p2)
      IvfStore.append(spark, batchDf.where(col("vec_id") % 2 =!= 0), p2)

      val q = queriesFor(e, qids)
      val r1 = rows(IvfStore.search(spark, p1, q, k = 5, nprobe = 3))
      val r2 = rows(IvfStore.search(spark, p2, q, k = 5, nprobe = 3))
      r2 shouldBe r1

      // appended vectors are findable: a query that IS an appended
      // vector must see some same-list neighbor set including other
      // appended docs' ids when they share lists — weaker but honest:
      // results must include at least one appended (÷3) doc overall
      val hits = r1.map(_._2)
      hits.exists(_ % 3 == 0) shouldBe true
    } finally { e.unpersist(); () }
  }

  test("compactLists folds append debris into one file per list, search unchanged") {
    val e = vecs.cache()
    try {
      val hist = e.where(col("vec_id") % 4 === 0)
      val path = new File(root, "ivf-compact").getAbsolutePath
      IvfStore.build(hist, path, nCentroids = 8, lloydIters = 1)
      // three append slices → several small files accumulate per list
      (1 to 3).foreach(i => IvfStore.append(spark, e.where(col("vec_id") % 4 === i), path))

      def listFileCounts(v: String): Map[String, Int] =
        new File(path, s"$v/lists").listFiles().filter(_.getName.startsWith("cid="))
          .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet")))
          .toMap
      val before = listFileCounts("v1")
      withClue(before) { before.values.max should be > 1 }

      val q = queriesFor(e, Seq(4L, 13L, 26L))
      val resBefore = rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3))

      IvfStore.compactLists(spark, path)

      // one file per surviving list, old version reclaimed, pointer bumped
      val names = new File(path).listFiles().map(_.getName)
      names.count(n => n.startsWith("v") && n.drop(1).forall(_.isDigit)) shouldBe 1
      names should contain("_current-2")
      val after = listFileCounts("v2")
      withClue(after) { after.values.max shouldBe 1 }
      after.values.sum should be < before.values.sum

      rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3)) shouldBe resBefore
    } finally { e.unpersist(); () }
  }

  test("needsRetrain trips on skewed lists and retrain restores fresh-build parity") {
    val e = vecs.cache()
    try {
      // history = a narrow slice (ids 1..40) → codebook fits that slice;
      // appending the REST of the corpus against the frozen codebook
      // piles drifted vectors into few lists
      val hist = e.where(col("vec_id") <= 40)
      val rest = e.where(col("vec_id") > 40)
      val path = new File(root, "ivf-skew").getAbsolutePath
      IvfStore.build(hist, path, nCentroids = 8, lloydIters = 1)
      IvfStore.append(spark, rest, path)

      if (IvfStore.needsRetrain(spark, path, skewFactor = 2.0)) {
        IvfStore.retrain(spark, path, nCentroids = 8, lloydIters = 1)
        IvfStore.needsRetrain(spark, path, skewFactor = 2.0) shouldBe false
      } else {
        // distribution happened not to skew at this fixture — retrain
        // must still be exactly a fresh build on the union
        IvfStore.retrain(spark, path, nCentroids = 8, lloydIters = 1)
      }

      // post-retrain store ≡ fresh build on the union corpus
      val fresh = new File(root, "ivf-fresh").getAbsolutePath
      IvfStore.build(e, fresh, nCentroids = 8, lloydIters = 1)
      val q = queriesFor(e, Seq(7L, 50L, 99L))
      rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3)) shouldBe
        rows(IvfStore.search(spark, fresh, q, k = 5, nprobe = 3))

      // and the superseded version was reclaimed: exactly one version
      // dir and one pointer survive the retrain
      val names = new File(path).listFiles().map(_.getName)
      names.count(n => n.startsWith("v") && n.drop(1).forall(_.isDigit)) shouldBe 1
      names.count(_.startsWith("_current-")) shouldBe 1
    } finally { e.unpersist(); () }
  }

  test("an unsealed partial version is invisible: readers keep serving the sealed one") {
    val e = vecs
    val path = new File(root, "ivf-crash").getAbsolutePath
    IvfStore.build(e, path, nCentroids = 8, lloydIters = 1)
    val q = queriesFor(e, Seq(4L, 11L))
    val before = rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3))

    // simulate a build/retrain that died between the codebook and list
    // writes: a v2 dir with a codebook that would mis-rank every probe,
    // and NO _current-2 pointer (the crash happened pre-commit)
    val zeroCb = spark.range(8).select(
      col("id").as("cid"),
      expr("array_repeat(cast(0.0 as double), 8)").as("cv"),
    )
    zeroCb.write.parquet(new File(path, "v2/codebook").getAbsolutePath)

    // search, append, and the retrain trigger must all still resolve v1
    rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3)) shouldBe before
    noException should be thrownBy IvfStore.needsRetrain(spark, path)

    // once a real retrain seals, it claims the NEXT seq past the debris
    // is not required — it just must not read the unsealed dir; the
    // current recipe redoes seq 2 with mode("overwrite"), which the
    // parity assertion below pins as safe
    IvfStore.retrain(spark, path, nCentroids = 8, lloydIters = 1)
    val freshPath = new File(root, "ivf-crash-fresh").getAbsolutePath
    IvfStore.build(e, freshPath, nCentroids = 8, lloydIters = 1)
    rows(IvfStore.search(spark, path, q, k = 5, nprobe = 3)) shouldBe
      rows(IvfStore.search(spark, freshPath, q, k = 5, nprobe = 3))
  }
}
