package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}
import graft.operators.ClusterRepStore

/** The streaming cluster-representative pipeline: foreachBatch is
  * at-least-once, so the store's batch-tag idempotence — not luck of
  * the checkpoint — is what keeps a redelivered micro-batch from being
  * absorbed twice; and the folded stream history must equal the
  * one-shot answer on the unioned corpus regardless of arrival order.
  */
class ClusterRepStreamSpec extends AnyFunSuite with Matchers with SparkSpec with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  private def docs: DataFrame =
    Tables.documents(spark, sf).select(col("doc_id"), col("text"), col("n_chars").cast("long").as("quality"))

  private def rows(df: DataFrame): Set[(Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def feedRows(df: DataFrame): Set[(String, Long, Long)] =
    df.select("op", "doc_id", "cluster").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("a sealed update replays idempotently under its batch tag, across a maintenance compact") {
    val path = Files.createTempDirectory("crep-replay").toFile.getAbsolutePath
    val half = pmod(col("doc_id"), lit(2L))
    val b0 = docs.where(half === 0)
    val b1 = docs.where(half === 1)

    DocumentStream.clusterRepBatch(b0, path, batchId = 0L)
    val feed1 = feedRows(DocumentStream.clusterRepBatch(b1, path, batchId = 1L))
    val seq1 = ClusterRepStore.currentSeq(spark, path).get
    val state1 = rows(ClusterRepStore.assignment(spark, path))

    // redelivery of batch 1 (same content, same id): no new seal,
    // the original feed comes back, the state is untouched
    feedRows(DocumentStream.clusterRepBatch(b1, path, batchId = 1L)) shouldBe feed1
    ClusterRepStore.currentSeq(spark, path).get shouldBe seq1
    rows(ClusterRepStore.assignment(spark, path)) shouldBe state1

    // a maintenance compact bumps the head; a straggler redelivery of
    // batch 1 must STILL be recognized as applied
    ClusterRepStore.compact(spark, path)
    val seqC = ClusterRepStore.currentSeq(spark, path).get
    seqC should be > seq1
    feedRows(DocumentStream.clusterRepBatch(b1, path, batchId = 1L)) shouldBe feed1
    ClusterRepStore.currentSeq(spark, path).get shouldBe seqC
    rows(ClusterRepStore.assignment(spark, path)) shouldBe state1
  }

  test("a real foreachBatch stream maintains the store; folded history equals the one-shot") {
    val in = Files.createTempDirectory("crep-in").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("crep-chk").toFile.getAbsolutePath
    val path = Files.createTempDirectory("crep-stream").toFile.getAbsolutePath
    val half = pmod(col("doc_id"), lit(2L))

    docs.where(half === 0).coalesce(1).write.mode("append").parquet(in)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, quality LONG")
      .parquet(in)
      .writeStream
      .option("checkpointLocation", chk)
      .foreachBatch { (df: DataFrame, id: Long) =>
        DocumentStream.clusterRepBatch(df, path, id).count()
        ()
      }
      .start()
    try {
      stream.processAllAvailable()
      docs.where(half === 1).coalesce(1).write.mode("append").parquet(in)
      stream.processAllAvailable()
    } finally stream.stop()

    // the one-shot answer: the store's own single-update form on the
    // unioned corpus (pinned equal to dedup_cluster_rep elsewhere)
    val oneShot = Files.createTempDirectory("crep-oneshot").toFile.getAbsolutePath
    ClusterRepStore.update(spark, oneShot, docs)
    rows(ClusterRepStore.assignment(spark, path)) shouldBe rows(ClusterRepStore.assignment(spark, oneShot))

    // and the stream's retained feed folds to exactly the kept pairs
    val feed = ClusterRepStore.feed(spark, path)
      .select("op", "doc_id", "cluster").collect()
    val asserts = feed.filter(_.getString(0) == "assert").map(r => (r.getLong(1), r.getLong(2))).toSet
    val retracts = feed.filter(_.getString(0) == "retract").map(r => (r.getLong(1), r.getLong(2))).toSet
    val kept = ClusterRepStore.assignment(spark, path).where(col("keep") === 1)
      .select("doc_id", "cluster").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (asserts -- retracts) shouldBe kept
  }
}
