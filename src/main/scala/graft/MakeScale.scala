package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an N×-data fixture from an sf dir as N DISJOINT
  * SHARDS (the scaling-ladder mechanism, ARCHITECTURE.md "one decade
  * further"):
  *
  *   - `documents`: doc_id offset per copy and every word suffixed `_k`
  *     — preserves within-shard shingle/Jaccard/vocab structure while
  *     making shards disjoint in shingle space (a genuinely bigger
  *     corpus, not N× exact duplicates that would quadratically inflate
  *     pairwise-dedup candidates); n_chars recomputed for the suffixed
  *     text so token/length queries stay self-consistent.
  *   - `embeddings`: vec_id offset per copy, vectors unchanged (N×
  *     corpus for kNN/IVF/PQ search; geometry per shard identical).
  *   - `events`: event_id/user_id offset per copy and ts shifted by
  *     k·370 days — shards are disjoint in time (370 d is a multiple of
  *     every window/cell size used, so per-shard windowing is identical
  *     and cross-shard interval overlaps are impossible: candidate
  *     pairs scale linearly, the same discipline as the shingle-space
  *     split) and disjoint in users (sessions/funnels/cohorts stay
  *     shard-local).
  *   - every other table: byte-copied once — the ladder queries scale on
  *     documents/embeddings/events; the rest only need to be readable.
  *
  * {{{ sbt "runMain graft.MakeScale /root/testdata/sf0.1 /tmp/sf1equiv 10" }}}
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScale <srcSfDir> <destDir> [copies=10]")
    val (src, dest) = (args(0), args(1))
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(dest))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docSpan = docs.agg(max("doc_id")).head().getLong(0) + 1
    (0 until copies)
      .map { k =>
        docs.select(
          (col("doc_id") + lit(k * docSpan)).as("doc_id"),
          expr(s"array_join(transform(split(text, ' '), w -> concat(w, '_$k')), ' ')").as("text"),
          col("lang"),
          col("source"),
        ).withColumn("n_chars", length(col("text")).cast("long"))
      }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embSpan = emb.agg(max("vec_id")).head().getLong(0) + 1
    (0 until copies)
      .map(k => emb.select((col("vec_id") + lit(k * embSpan)).as("vec_id"), col("embedding"), col("label")))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    val ev = Tables.events(spark, src) // unit-sniffed read: ts lands as µs
    val evSpan = ev.agg(max("event_id")).head().getLong(0) + 1
    val userSpan = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until copies)
      .map { k =>
        ev.select(
          (col("event_id") + lit(k * evSpan)).as("event_id"),
          expr(s"ts + make_interval(0, 0, 0, ${k * 370L}, 0, 0, 0)").as("ts"),
          (col("user_id") + lit(k * userSpan)).as("user_id"),
          col("event_type"), col("value"), col("props"),
        )
      }
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dest/events.parquet")

    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem").foreach { t =>
      Files.copy(
        Paths.get(s"$src/$t.parquet"), Paths.get(s"$dest/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING,
      )
      ()
    }
    println(s"[make-scale] wrote ${copies}x documents/embeddings/events shards + passthrough tables to $dest")
    spark.stop()
  }
}
