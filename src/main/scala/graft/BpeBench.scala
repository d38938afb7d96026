package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Train-time ladder for [[graft.operators.BpeTokenizer]]: the bench
  * suite's `vocab_bpe_train` pins the sequential loop at N=8, but a
  * real vocabulary is learned at thousands of merges, where the
  * sequential form is nMerges Spark jobs. This main prices sequential
  * vs batched training at N=256 on the SAME corpus word table and
  * prints one JSON line; measured numbers live in ARCHITECTURE.md.
  */
object BpeBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The synthetic testdata corpus draws from a ~31-word pool at every
    // SF, so corpus-derived training EXHAUSTS at ~90 merges — fine for
    // pinning batched≡sequential, useless for vocabulary-scale
    // economics. SPARK_GRAFT_BPE_SYNTH=<n> swaps in a deterministic
    // generated word table (base-36 id encoding → distinct multi-char
    // words over a 36-symbol alphabet; zipf-ish 1/(id+1) frequencies)
    // whose pair diversity sustains tens of thousands of merges.
    val synth = sys.env.get("SPARK_GRAFT_BPE_SYNTH").map(_.toLong)
    val words = (synth match {
      case Some(nw) =>
        // freq must be a LONG like the corpus path's count(): Spark's
        // `/` is true division, and a DOUBLE freq would train the
        // sequential form on fractional mass while the batched form
        // truncates per round — the comparison would measure the type
        // discrepancy, not the batching (review-round-16 catch)
        spark.range(nw).select(
          concat(lit("w"), expr("conv(id, 10, 36)")).as("word"),
          expr("CAST(1000000 DIV (id + 1) AS BIGINT) + 1").as("freq"))
      case None =>
        Tables.documents(spark, sfDir)
          .select(explode(split(col("text"), " ")).as("word"))
          .where(col("word") =!= "")
          .groupBy("word").agg(count(lit(1)).as("freq"))
    }).cache()
    val vocab = words.count()

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val n = sys.env.getOrElse("SPARK_GRAFT_BPE_N", "256").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_BPE_K", "32").toInt
    // warm-up (JIT/codegen) at a small count, then the measured ladder.
    // The synthetic corpus's word pool can exhaust below N (every word
    // fully fused) — both forms must exhaust at the SAME count, and the
    // ladder is timed to that shared exhaustion point. At vocabulary
    // scale (SYNTH mode, N in the thousands) the sequential form IS the
    // known-slow baseline — N full Spark jobs — so it only runs up to
    // SPARK_GRAFT_BPE_NSEQ (default 256) and the batched form carries
    // the full ladder point.
    graft.operators.BpeTokenizer.train(words, 4)
    val nSeq =
      if (synth.isEmpty) n
      else math.min(n, sys.env.getOrElse("SPARK_GRAFT_BPE_NSEQ", "256").toInt)
    val (seqM, tSeq) = time(graft.operators.BpeTokenizer.train(words, nSeq))
    val (batM, tBat) = time(graft.operators.BpeTokenizer.trainBatched(words, n, k))
    // The two forms USUALLY exhaust at the same merge count, but a
    // deferred-conflict round can change pair availability near
    // exhaustion — report both counts (and set overlap on the common
    // prefix) instead of hard-failing the bench on a size mismatch.
    val common = math.min(seqM.size, batM.size)
    val overlap = seqM.take(common).toSet.intersect(batM.take(common).toSet).size

    spark.stop()
    println(
      s"""{"bench":"bpe_train_ladder","sf":"$sfDir","vocab_words":$vocab,"n_requested":$n,""" +
        synth.map(nw => s""""synth_words":$nw,"n_seq_requested":$nSeq,""").getOrElse("") +
        s""""n_learned_seq":${seqM.size},"n_learned_batched":${batM.size},"batch":$k,""" +
        s""""seq_sec":${f"$tSeq%.2f"},"batched_sec":${f"$tBat%.2f"},""" +
        s""""speedup":${f"${tSeq / tBat}%.2f"},"merge_overlap":$overlap}""",
    )
  }
}
