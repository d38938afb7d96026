package graft.operators

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Incremental SemDeDup over the IVF store must implement EXACTLY the
  * documented suppression contract — store members and earlier-ranked
  * batch-mates suppress at `tau` — so a sequential reference over the
  * collected data pins it; absorbed members must suppress the next
  * batch (the screen-and-absorb memory); and the corpus read must stay
  * a partition-pruned scan of the batch's clusters.
  */
class SemDedupSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"
  private val tau = 0.3
  private var root: File = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    root = Files.createTempDirectory("graft-semdedup").toFile
  }

  override def afterAll(): Unit = {
    def rm(f: File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(root)
    super.afterAll()
  }

  private def vecs = graft.queries.SimilarityQueries.vecs(spark, sf)

  /** The frozen-codebook assignment rule: max cosine, ties to the
    * smallest cid — bit-exact with [[IvfStore.assign]] (same fold as
    * the `cosine_similarity` expression).
    */
  private def assignOf(v: Array[Double], cb: Seq[(Long, Array[Double])]): (Long, Double) = {
    val scored = cb.map { case (cid, cv) => (cid, VecMath.cosine(v, cv)) }
    scored.minBy { case (cid, s) => (-s, cid) }
  }

  /** Sequential reference of the documented contract, computed from
    * the store's CURRENT codebook and lists — so it also pins the
    * post-retrain geometry.
    */
  private def referenceKept(path: String, batch: org.apache.spark.sql.DataFrame): Set[Long] = {
    val cb = IvfStore.codebookDf(spark, path).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
    // cid is the hive partition column — it reads back as Integer
    val stored = IvfStore.listsDf(spark, path).collect()
      .map(r => (r.getAs[Number]("cid").longValue(), r.getAs[Long]("vec_id"), r.getAs[Seq[Double]]("v").toArray))
    val b = batch.collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Double]]("v").toArray))
      .map { case (id, v) => val (cid, acos) = assignOf(v, cb); (cid, id, v, acos) }
    b.groupBy(_._1).flatMap { case (cid, members) =>
      val ranked = members.sortBy { case (_, id, _, acos) => (acos, id) }
      val inCluster = stored.filter(_._1 == cid)
      ranked.zipWithIndex.collect {
        case ((_, id, v, _), i)
            if !inCluster.exists(s => VecMath.cosine(v, s._3) >= tau) &&
              !ranked.take(i).exists(m => VecMath.cosine(v, m._3) >= tau) => id
      }.toSeq
    }.toSet
  }

  test("screen equals the sequential reference on a real corpus/batch split") {
    val e = vecs.cache()
    try {
      val corpus = e.where(col("vec_id") >= 100)
      val batch = e.where(col("vec_id") < 100)
      val path = new File(root, "sd-ref").getAbsolutePath
      IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L))

      val keptIds = SemDedup.screenBatch(spark, path, batch, tau)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val expected = referenceKept(path, batch)

      withClue(s"kept=${keptIds.size} expected=${expected.size}") { keptIds shouldBe expected }
      keptIds.nonEmpty shouldBe true
      // the screen actually prunes something on this data
      keptIds.size should be < batch.count().toInt
    } finally { e.unpersist(); () }
  }

  test("absorbed members suppress the next batch") {
    val e = vecs.cache()
    try {
      val corpus = e.where(col("vec_id") >= 100)
      val path = new File(root, "sd-absorb").getAbsolutePath
      IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L))

      val b1 = e.where(col("vec_id") < 50)
      val kept1 = SemDedup.screenAndAbsorbBatch(spark, path, b1, tau)

      // batch 2 carries an exact copy (cos = 1) of an absorbed member
      // under a fresh id, plus untouched later vectors
      val copy = kept1.orderBy("vec_id").limit(1)
        .select(lit(9999L).as("vec_id"), col("label"), col("v"))
      val b2 = e.where(col("vec_id").between(50, 99))
        .select("vec_id", "label", "v").unionByName(copy)
      val kept2 = SemDedup.screenBatch(spark, path, b2, tau)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      kept2 should not contain 9999L
      // kept1 is a materialized read, not live lineage — re-evaluating
      // it after the absorb must NOT re-screen (which would now find
      // every member duplicated by its own absorbed copy)
      kept1.count() should be > 0L
    } finally { e.unpersist(); () }
  }

  test("screening survives a retrain: the contract holds against the new geometry") {
    val e = vecs.cache()
    try {
      val corpus = e.where(col("vec_id") >= 100)
      val path = new File(root, "sd-retrain").getAbsolutePath
      IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L))
      SemDedup.screenAndAbsorbBatch(spark, path, e.where(col("vec_id") < 30), tau).count()

      // retrain re-clusters corpus + absorbed rows under new centroids
      IvfStore.retrain(spark, path, nCentroids = 16, lloydIters = 1)

      val b2 = e.where(col("vec_id").between(30, 59))
      val kept = SemDedup.screenBatch(spark, path, b2, tau)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      kept shouldBe referenceKept(path, b2)
    } finally { e.unpersist(); () }
  }

  test("streaming embedding dedup: foreachBatch screen-and-absorb remembers across batches") {
    val e = vecs.cache()
    try {
      val corpus = e.where(col("vec_id") >= 100)
      val path = new File(root, "sd-stream").getAbsolutePath + "/idx"
      IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L))

      val in = new File(root, "sd-stream-in"); in.mkdirs()
      val chk = new File(root, "sd-stream-chk").getAbsolutePath
      val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
      val schema = e.select("vec_id", "label", "v").schema
      val q = spark.readStream.schema(schema).parquet(in.getAbsolutePath)
        .writeStream.option("checkpointLocation", chk)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          kept ++= SemDedup.screenAndAbsorbBatch(spark, path, b, tau)
            .select("vec_id").collect().map(_.getLong(0))
          ()
        }
        .start()

      e.where(col("vec_id") < 30).select("vec_id", "label", "v")
        .coalesce(1).write.mode("append").parquet(in.getAbsolutePath)
      q.processAllAvailable()
      kept.nonEmpty shouldBe true
      val absorbed = kept.min

      // next micro-batch: an exact copy of an ABSORBED member under a
      // fresh id — the stream's own past is remembered through the
      // store, not query state — plus fresh vectors
      e.where(col("vec_id") === absorbed)
        .select(lit(8888L).as("vec_id"), col("label"), col("v"))
        .unionByName(e.where(col("vec_id").between(30, 40)).select("vec_id", "label", "v"))
        .coalesce(1).write.mode("append").parquet(in.getAbsolutePath)
      q.processAllAvailable()
      q.stop()
      kept should not contain 8888L
    } finally { e.unpersist(); () }
  }

  test("guarded absorb drops eval-similar members before screening or absorbing") {
    val e = vecs.cache()
    try {
      val corpus = e.where(col("vec_id") >= 100)
      val path = new File(root, "sd-guard").getAbsolutePath
      IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L))

      val eval = e.where(col("vec_id") < 10).select("vec_id", "label", "v")
      // poison: an exact copy of an eval vector smuggled into the batch
      val poison = e.where(col("vec_id") === 5)
        .select(lit(7777L).as("vec_id"), col("label"), col("v"))
      val batch = e.where(col("vec_id").between(10, 49))
        .select("vec_id", "label", "v").unionByName(poison)

      val kept = SemDedup.guardedScreenAndAbsorb(spark, path, batch, tau, eval, evalTau = 0.99)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      kept should not contain 7777L
      kept.nonEmpty shouldBe true
      // the contaminated row was dropped BEFORE absorb, not just unreturned
      IvfStore.listsDf(spark, path).where(col("vec_id") === 7777L).count() shouldBe 0L
    } finally { e.unpersist(); () }
  }

  test("index-routed decontamination: exact subset of brute force, recall from nprobe") {
    val e = vecs.cache()
    try {
      val corpus = e.where(col("vec_id") >= 20)
      val eval = e.where(col("vec_id") < 20).select("vec_id", "label", "v")
      val path = new File(root, "sd-decon").getAbsolutePath
      IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(20L to 35L))

      // brute-force reference over collected data (480 x 20 cosines)
      val ev = eval.collect().map(_.getAs[Seq[Double]]("v").toArray)
      val bf = corpus.collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Double]]("v").toArray))
        .map { case (id, v) => id -> ev.map(VecMath.cosine(v, _)).max }
        .filter(_._2 >= tau).toMap
      bf.nonEmpty shouldBe true

      val routed = SemDedup.decontaminate(spark, path, eval, tau, nprobe = 2)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("eval_sim")).toMap
      // no false positives, exact similarities on everything found
      routed.keySet.subsetOf(bf.keySet) shouldBe true
      routed.foreach { case (id, sim) => sim shouldBe bf(id) }
      // useful recall at nprobe=2 of 16 clusters
      routed.size.toDouble / bf.size should be >= 0.5
      // probing every cluster recovers brute force exactly
      val full = SemDedup.decontaminate(spark, path, eval, tau, nprobe = 16)
        .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("eval_sim")).toMap
      full shouldBe bf
    } finally { e.unpersist(); () }
  }

  test("the corpus read prunes to the batch's cluster partitions") {
    val e = vecs
    val corpus = e.where(col("vec_id") >= 100)
    val path = new File(root, "sd-prune").getAbsolutePath
    IvfStore.build(corpus, path, nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L))

    val one = e.where(col("vec_id") === 3)
    val res = SemDedup.screenBatch(spark, path, one, tau)
    val files = res.queryExecution.executedPlan.collectLeaves().flatMap {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.inputFiles.toSeq
      case _ => Seq.empty
    }
    val cids = files.filter(_.contains("/lists/")).flatMap { p =>
      "cid=(\\d+)".r.findFirstMatchIn(p).map(_.group(1).toInt)
    }.distinct
    // a one-vector batch touches exactly one cluster
    withClue(s"scanned cids: $cids") { cids.size should be <= 1 }
    res.count() should be <= 1L
  }
}
