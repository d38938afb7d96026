package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, labeling every
  * node with the minimum node id of its component (the canonical
  * "keeper" in a dedup-cluster pipeline).
  *
  * Adaptive two-branch execution, extracted from the dedup_clusters
  * query so both branches are independently testable:
  *
  *   - A candidate graph that fits on the driver is solved with
  *     union-find in one pass (Spark itself localizes small work — cf.
  *     LocalTableScan / broadcast). The branch probe IS the collection:
  *     `head(cap+1)` pulls at most cap+1 edges (~1.6 MB at the default
  *     cap), so the small case pays no extra pass and the big case
  *     stops reading at the cap.
  *   - Bigger graphs take distributed min-label propagation: one
  *     join+groupBy per round, rounds ~ graph diameter. Each round ends
  *     in an eager `localCheckpoint()` — same one-materialization cost
  *     as the cache+count it replaces, but it also TRUNCATES LINEAGE,
  *     so the logical plan stays O(1) instead of growing with every
  *     round (a real 100-TB graph's diameter would otherwise blow
  *     analysis time and stack depth long before data cost matters).
  *
  * Storage footprint of the checkpoint chain: at most two snapshots
  * (the current labels and the in-flight next round) are ever strongly
  * referenced; superseded ones are freed by ContextCleaner when GC'd
  * (localCheckpoint has no explicit free API), so worst-case transient
  * storage between GCs is O(rounds-since-GC × labels), at
  * MEMORY_AND_DISK — it spills rather than evicting working memory.
  *
  * Convergence is checked every `convergenceCheckEvery` rounds, not
  * every round: min-label propagation is monotone and stationary once
  * converged (a round with zero changes implies all later rounds change
  * nothing), so a periodic consecutive-round comparison is still exact,
  * and on diameter-heavy graphs it cuts job count from 2/round toward
  * 1/round at the cost of up to `convergenceCheckEvery − 1` extra
  * (cheap, already-converged) rounds.
  */
object ConnectedComponents {

  /** Label each node of the undirected graph `pairs` (columns `a`, `b`,
    * both LONG, one row per edge in either orientation) with the min
    * node id reachable from it. Returns columns (`node`, `label`).
    *
    * @param cap max edge count solved driver-side; above it the
    *            distributed label-propagation branch runs. Exposed so
    *            tests can force the big branch on synthetic data.
    * @param convergenceCheckEvery cadence (in rounds) of the
    *            consecutive-round convergence count in the distributed
    *            branch; 1 restores the check-every-round behavior.
    */
  def minLabel(pairs: DataFrame, cap: Int = 100000, convergenceCheckEvery: Int = 3): DataFrame =
    minLabelStats(pairs, cap, convergenceCheckEvery)._1

  /** [[minLabel]], also returning the distributed rounds executed
    * (0 = the driver union-find branch ran) — the observable the round
    * cadence and the scale-timing harness ([[graft.CCBench]]) pin.
    */
  def minLabelStats(
      pairs: DataFrame,
      cap: Int = 100000,
      convergenceCheckEvery: Int = 3,
  ): (DataFrame, Int) = {
    require(convergenceCheckEvery >= 1, s"convergenceCheckEvery must be >= 1, got $convergenceCheckEvery")
    val spark = pairs.sparkSession
    import spark.implicits._
    val edgesIn = pairs.select(col("a").cast("long").as("a"), col("b").cast("long").as("b")).cache()
    val headEdges = edgesIn.as[(Long, Long)].head(cap + 1)
    if (headEdges.length <= cap) {
      edgesIn.unpersist()
      (local(spark, headEdges), 0)
    } else {
      val edges = edgesIn.union(edgesIn.select(col("b").as("a"), col("a").as("b"))).cache()
      edges.count() // materialize, then release the upstream cache
      edgesIn.unpersist()
      var labels = edges.select(col("a").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint() // eager: bounded plan from round 0
      var round = 0
      var converged = false
      while (!converged) {
        round += 1
        // each node adopts the min label among itself and its neighbors;
        // eager localCheckpoint materializes the round AND cuts lineage
        val next = edges
          .join(labels, edges("b") === labels("node"))
          .select(edges("a").as("node"), col("label"))
          .union(labels)
          .groupBy("node")
          .agg(min("label").as("label"))
          .localCheckpoint()
        if (round % convergenceCheckEvery == 0) {
          converged = next.as("n")
            .join(labels.as("o"), col("n.node") === col("o.node"))
            .where(col("n.label") =!= col("o.label"))
            .count() == 0L
        }
        labels = next
      }
      edges.unpersist()
      (labels, round)
    }
  }

  /** Driver-side union-find with path compression — a chain-shaped
    * graph near the threshold would blow the stack recursively.
    */
  private def local(spark: org.apache.spark.sql.SparkSession, es: Array[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    es.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.toSeq.map(n => (n, find(n))).toDF("node", "label")
  }
}
