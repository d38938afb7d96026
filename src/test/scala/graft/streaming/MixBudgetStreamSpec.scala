package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Streaming token-budget mixture sampling
  * ([[DocumentStream.sampleToBudgetBatch]]): per-source budgets must be
  * respected ACROSS micro-batches (the carried state), each batch's
  * selection must be the deterministic md5-order take-while the batch
  * query uses, and a replayed batch must land on exactly the same
  * selection and state (foreachBatch is at-least-once).
  */
class MixBudgetStreamSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val budgets = Map("src0" -> 60L, "src1" -> 25L)
  private val default = 40L

  /** The md5-order key both engines use (first 8 hex chars as a long). */
  private def h(docId: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** One doc: id, source, and a text of `nTok` space-separated words. */
  private def doc(id: Long, source: String, nTok: Int): (Long, String, String) =
    (id, Seq.fill(nTok)("w").mkString(" "), source)

  private def toDf(rows: Seq[(Long, String, String)]): DataFrame = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "source")
  }

  /** Sequential reference: per batch, per source, take docs in
    * (h, doc_id) order while carried + running-sum <= budget; carry
    * only KEPT tokens forward.
    */
  private def reference(
      batches: Seq[Seq[(Long, String, String)]],
  ): (Set[Long], Map[String, Long]) = {
    val taken = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val kept = scala.collection.mutable.Set.empty[Long]
    batches.foreach { batch =>
      batch.groupBy(_._3).foreach { case (src, rows) =>
        val budget = budgets.getOrElse(src, default)
        var cum = taken(src)
        rows.sortBy(r => (h(r._1), r._1)).foreach { case (id, text, _) =>
          val n = text.split(" ").length
          cum += n
          if (cum <= budget) { kept += id; taken(src) += n }
        }
      }
    }
    (kept.toSet, taken.toMap)
  }

  private val batch0 = Seq(doc(1, "src0", 20), doc(2, "src0", 20), doc(3, "src1", 10), doc(4, "src2", 15))
  private val batch1 = Seq(doc(5, "src0", 20), doc(6, "src0", 20), doc(7, "src1", 10), doc(8, "src1", 10))
  private val batch2 = Seq(doc(9, "src0", 5), doc(10, "src1", 4), doc(11, "src2", 30), doc(12, "src2", 5))

  test("budgets hold across batches and the selection matches the sequential reference") {
    val statePath = Files.createTempDirectory("mix-state").toFile.getAbsolutePath
    val got = scala.collection.mutable.Set.empty[Long]
    Seq(batch0, batch1, batch2).zipWithIndex.foreach { case (b, i) =>
      val kept = DocumentStream.sampleToBudgetBatch(toDf(b), statePath, i.toLong, budgets, default)
      got ++= kept.select("doc_id").collect().map(_.getLong(0))
    }
    val (refKept, refTaken) = reference(Seq(batch0, batch1, batch2))
    got.toSet shouldBe refKept

    val state = spark.read.parquet(s"$statePath/state-2").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    state shouldBe refTaken
    // the carried totals never exceed any budget
    state.foreach { case (src, t) => t should be <= budgets.getOrElse(src, default) }
  }

  test("a replayed last batch lands on the identical selection and state") {
    val statePath = Files.createTempDirectory("mix-replay").toFile.getAbsolutePath
    DocumentStream.sampleToBudgetBatch(toDf(batch0), statePath, 0L, budgets, default)
    val first = DocumentStream.sampleToBudgetBatch(toDf(batch1), statePath, 1L, budgets, default)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val stateFirst = spark.read.parquet(s"$statePath/state-1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet

    // crash-and-replay: foreachBatch re-runs batch 1 — whatever the
    // crash window left behind (sealed marker included), the replay
    // must recompute from state-0 and overwrite its own outputs
    val replay = DocumentStream.sampleToBudgetBatch(toDf(batch1), statePath, 1L, budgets, default)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val stateReplay = spark.read.parquet(s"$statePath/state-1").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    replay shouldBe first
    stateReplay shouldBe stateFirst
  }

  test("states two generations back are reclaimed; the predecessor survives for replay") {
    val statePath = Files.createTempDirectory("mix-gc").toFile.getAbsolutePath
    Seq(batch0, batch1, batch2).zipWithIndex.foreach { case (b, i) =>
      DocumentStream.sampleToBudgetBatch(toDf(b), statePath, i.toLong, budgets, default)
      ()
    }
    val names = new java.io.File(statePath).listFiles().map(_.getName).toSet
    names should contain allOf ("state-2", "_mix-2", "state-1", "_mix-1")
    names should not contain "state-0"
    names should not contain "_mix-0"
  }

  test("a real foreachBatch stream drives the sampler end to end") {
    val in = Files.createTempDirectory("mix-in").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("mix-chk").toFile.getAbsolutePath
    val statePath = Files.createTempDirectory("mix-stream-state").toFile.getAbsolutePath
    val outIds = scala.collection.mutable.Set.empty[Long]

    toDf(batch0).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, source STRING")
      .parquet(in)
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (df: DataFrame, id: Long) =>
        val kept = DocumentStream.sampleToBudgetBatch(df, statePath, id, budgets, default)
        outIds ++= kept.select("doc_id").collect().map(_.getLong(0))
        ()
      }
      .start()
    try {
      stream.processAllAvailable()
      toDf(batch1).coalesce(1).write.mode("append").parquet(in)
      stream.processAllAvailable()
    } finally stream.stop()

    val (refKept, _) = reference(Seq(batch0, batch1))
    outIds.toSet shouldBe refKept
  }
}
