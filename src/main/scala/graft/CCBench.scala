package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-timing harness for [[graft.operators.ConnectedComponents]]:
  * the bench suite's `dedup_clusters` always takes the driver union-find
  * branch (the sf0.1 candidate graph sits under the 100k-edge cap), so
  * the distributed label-propagation branch — the 100-TB code path — is
  * correctness-verified but never timed by BENCH. This main times BOTH
  * branches on the SAME minhash candidate graph (cap forced low for the
  * distributed run) and prints one JSON line; measured numbers live in
  * ARCHITECTURE.md.
  */
object CCBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // same candidate graph dedup_clusters runs on
    val pairs = graft.queries.DedupQueries.minhashPairs(spark, sfDir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .cache()
    val nEdges = pairs.count() // warm + materialize: both branches then read the same cached edges

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def run(cap: Int): (Long, Int, Double) = {
      val ((labels, rounds), dt) = time {
        val (l, r) = graft.operators.ConnectedComponents.minLabelStats(pairs, cap = cap)
        (l.cache(), r)
      }
      val n = labels.count()
      labels.unpersist()
      (n, rounds, dt)
    }

    // warm-up pass (JIT/codegen), then measured passes, driver first
    run(cap = 10000000)
    val (nodesD, _, tDriver) = run(cap = 10000000)
    val (nodesX, rounds, tDist) = run(cap = 100)
    require(nodesD == nodesX, s"branch disagreement: $nodesD vs $nodesX labeled nodes")

    // fanout-scaled graph: K disjoint offset copies of the real candidate
    // graph — edge volume grows K-fold while per-component structure
    // (and so the round count) is preserved, which is exactly how a
    // bigger corpus grows this graph (more clusters, not wider ones).
    val copies = sys.env.getOrElse("SPARK_GRAFT_CC_COPIES", "4000").toInt
    val off = 1000000000L
    val scaled = pairs
      .crossJoin(broadcast(spark.range(copies).toDF("c")))
      .select((col("a") + col("c") * off).as("a"), (col("b") + col("c") * off).as("b"))
      .cache()
    val nScaled = scaled.count()
    def runScaled(cap: Int): (Long, Int, Double) = {
      val ((labels, r), dt) = time {
        val (l, rr) = graft.operators.ConnectedComponents.minLabelStats(scaled, cap = cap)
        (l.cache(), rr)
      }
      val n = labels.count()
      labels.unpersist()
      (n, r, dt)
    }
    runScaled(cap = Int.MaxValue - 1) // warm
    val (snD, _, stDriver) = runScaled(cap = Int.MaxValue - 1)
    val (snX, sRounds, stDist) = runScaled(cap = 100)
    require(snD == snX, s"scaled branch disagreement: $snD vs $snX labeled nodes")

    spark.stop()
    println(
      s"""{"metric":"cc_branch_compare","edges":$nEdges,"nodes":$nodesD,""" +
        s""""driver_sec":${"%.2f".format(tDriver)},"dist_sec":${"%.2f".format(tDist)},""" +
        s""""dist_rounds":$rounds,""" +
        s""""scaled_edges":$nScaled,"scaled_nodes":$snD,""" +
        s""""scaled_driver_sec":${"%.2f".format(stDriver)},"scaled_dist_sec":${"%.2f".format(stDist)},""" +
        s""""scaled_dist_rounds":$sRounds,"sf":"$sfDir"}""",
    )
  }
}
