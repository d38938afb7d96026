package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pricing for [[graft.operators.ClusterRepStore]] (ROADMAP 84): the
  * per-ingest cost a pipeline actually pays — absorbing a FIXED-size
  * batch against a store holding the rest of the corpus — next to the
  * one-shot re-cluster it replaces. Run at sf0.1 and at the
  * MakeScale 10× fixture: the one-shot tracks the corpus (every ingest
  * re-shingles and re-hashes everything), the absorb tracks the batch
  * plus a columnar scan of stored signatures (history is never
  * re-shingled). A warm-up build+absorb into a throwaway store runs
  * first — the update path is a long chain of small jobs, and cold
  * JIT/codegen otherwise dominates the first measured number (seen as
  * a 2× distortion when this lived inside CCBench's tail).
  */
object ClusterRepBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.fanout(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text"), col("n_chars").cast("long").as("quality"))
      .cache()
    val nDocs = docs.count()
    // FIXED ~500-doc batch regardless of corpus scale: the ladder then
    // isolates the absorb cost from corpus growth
    val oneIn = math.max(1L, nDocs / 500L)
    val inBatch = expr(
      s"CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % $oneIn = 0")
    val nBatch = docs.where(inBatch).count()

    val root = java.nio.file.Files.createTempDirectory("crep-bench").toFile
    def path(n: String) = new java.io.File(root, n).getAbsolutePath

    // warm-up: exercise the full build + absorb path untimed
    graft.operators.ClusterRepStore.update(spark, path("warm"), docs.where(inBatch))
    graft.operators.ClusterRepStore.update(spark, path("warm"), docs.where(!inBatch).limit(500))

    val (_, tBase) = time(graft.operators.ClusterRepStore.update(spark, path("store"), docs.where(!inBatch)))
    val (_, tBatch) = time(graft.operators.ClusterRepStore.update(spark, path("store"), docs.where(inBatch)))
    val (_, tOneShot) = time(graft.operators.ClusterRepStore.update(spark, path("oneshot"), docs))
    // retention retraction of the same fixed-size set: the tombstone +
    // keeper-recompute path (its one corpus-proportional piece is the
    // survivor scan over affected clusters)
    val (_, tRetract) = time(
      graft.operators.ClusterRepStore.retract(spark, path("store"), docs.where(inBatch).select("doc_id")))
    Fs.rmTree(root)

    spark.stop()
    println(
      s"""{"metric":"cluster_rep_price","docs":$nDocs,"batch_docs":$nBatch,""" +
        s""""base_build_sec":${"%.2f".format(tBase)},"batch_absorb_sec":${"%.2f".format(tBatch)},""" +
        s""""oneshot_sec":${"%.2f".format(tOneShot)},"retract_sec":${"%.2f".format(tRetract)},"sf":"$sfDir"}""",
    )
  }
}
