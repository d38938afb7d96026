package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.DocumentStream

/** Prices the two streaming near-dup forms against each other at
  * realistic micro-batch sizes (ROADMAP 25):
  *
  *   - QUERY-STATE ([[DocumentStream.nearDupStream]]): per-(band,sig)
  *     keyed state inside the streaming engine — state lookup cost per
  *     batch, TTL-bounded corpus memory.
  *   - STORE-BACKED ([[DocumentStream.screenAndAbsorbBatch]]): a
  *     parquet band-join per batch against the persisted
  *     [[graft.operators.BandsStore]] — scan + join cost per batch,
  *     unbounded corpus memory shared with the batch pipeline.
  *
  * Both consume the SAME batch slices of the documents table, so the
  * numbers are a like-for-like price of "state lookup" vs "band join"
  * per micro-batch. Emits one JSON line:
  * `{"metric":"stream_dedup_ms","batches":B,"rowsPerBatch":N,
  *   "state":[ms...],"store":[ms...],"stateTotal":..,"storeTotal":..,
  *   "stateFlags":..,"storeFlags":..}`.
  *
  * Expectation to verify, not assume: the state form should win on
  * small batches (state lookups touch only arriving keys; the store
  * join re-scans ever-growing band partitions), while the store form
  * amortizes at large batches and buys corpus-wide memory — the
  * measured crossover is the number ARCHITECTURE.md records.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // slice the corpus into arrival-stamped micro-batches (doc_id mod B:
    // deterministic, near-equal sizes, duplicates spread across batches)
    val docs = Tables.documents(spark, sfDir)
      .withColumn("arrival", expr("timestamp'2024-01-01 10:00:00' + make_interval(0,0,0,0,0,0, doc_id % 600)"))
      .select("doc_id", "text", "lang", "arrival")
      .cache()
    val total = docs.count()
    val batches = (0 until nBatches).map(i => docs.where(pmod(col("doc_id"), lit(nBatches)) === i))
    // warm codegen/parquet paths so batch 0 isn't charged for startup
    DocumentStream.bandSignatures(batches.head).write.mode("overwrite").format("noop").save()

    def timeMs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
    }

    // ---- form 1: query state (file source -> flatMapGroupsWithState -> memory sink)
    val inDir = Files.createTempDirectory("graft-sb-in").toFile.getAbsolutePath
    val chk = Files.createTempDirectory("graft-sb-chk").toFile.getAbsolutePath
    val q = DocumentStream
      .nearDupStream(DocumentStream.readDocs(spark, inDir))
      .writeStream.format("memory").queryName("sb_state").outputMode("append")
      .option("checkpointLocation", chk)
      .start()
    val stateMs = batches.map { b =>
      timeMs {
        b.coalesce(1).write.mode("append").parquet(inDir)
        q.processAllAvailable()
      }
    }
    val stateFlags = spark.sql("SELECT DISTINCT doc_id, dup_of FROM sb_state").count()
    q.stop()

    // ---- form 2: store-backed (screen batch against persisted bands, absorb)
    // Optional scale probe (ROADMAP 27): pre-seed the store with SEED_X
    // disjoint copies of the corpus' bands (doc_ids offset into a range
    // the stream never uses, sigs salted per copy so they collide with
    // nothing) — pure history MASS, isolating the store form's
    // history-proportional screen term from job overhead. The state form
    // needs no counterpart: its per-batch cost touches only arriving
    // keys by construction, which is exactly the asymmetry this measures.
    val seedX = sys.env.getOrElse("SPARK_GRAFT_STREAM_SEED_X", "0").toInt
    val storePath = Files.createTempDirectory("graft-sb-store").toFile.getAbsolutePath + "/bands"
    if (seedX > 0) {
      val bands = DocumentStream.bandSignatures(docs).select("doc_id", "band", "sig")
      (1 to seedX).foreach { i =>
        bands
          .select(
            (col("doc_id") + lit(1000000L * i)).as("doc_id"),
            col("band"),
            concat(col("sig"), lit(s"#seed$i")).as("sig"),
          )
          .write.mode("append").partitionBy("band").parquet(storePath)
      }
    }
    var storeFlags = 0L
    val storeMs = batches.map { b =>
      timeMs { storeFlags += DocumentStream.screenAndAbsorbBatch(b, storePath).count() }
    }

    def arr(xs: Seq[Double]) = xs.map(x => f"$x%.1f").mkString("[", ",", "]")
    println(
      s"""{"metric":"stream_dedup_ms","batches":$nBatches,"rowsPerBatch":${total / nBatches},"seedX":$seedX,""" +
        s""""state":${arr(stateMs)},"store":${arr(storeMs)},""" +
        f""""stateTotal":${stateMs.sum}%.1f,"storeTotal":${storeMs.sum}%.1f,""" +
        s""""stateFlags":$stateFlags,"storeFlags":$storeFlags}""",
    )
    spark.stop()
  }
}
