package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the PageRank iteration's shuffle shape: the edge relation is
  * cached pre-partitioned on the join key (`src`), so each iteration
  * shuffles only the small rank side — the cached big side must join
  * straight out of the cache with NO Exchange above its scan. At 100 TB
  * this is the difference between moving the edge relation once vs once
  * per iteration.
  */
class GraphPlanSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("pre-partitioned cached edges join without a fresh exchange") {
    val e = spark.range(1000).select(
      (col("id") % 97).as("src"), (col("id") % 31).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgeDeg = e.join(deg, "src").repartition(col("src")).cache()
    edgeDeg.count() // materialize
    try {
      val rank = deg.select(col("src").as("node"), lit(1000000000L).as("rank"))
      val it = rank.join(edgeDeg, col("src") === col("node"))
        .select(col("dst").as("node2"), expr("rank div outdeg").as("contrib"))
        .groupBy(col("node2").as("node"))
        .agg(expr("150000000 + (85 * sum(contrib)) div 100").as("rank"))
      it.collect()
      val plan = it.queryExecution.executedPlan.toString
      plan should include("InMemoryTableScan")
      // the cached side must not be re-shuffled: every Exchange in the
      // final plan sits on the rank/aggregate path, i.e. the plan slice
      // from the InMemoryTableScan upward to the join has no Exchange
      val scanIdx = plan.indexOf("InMemoryTableScan")
      val joinIdx = plan.lastIndexOf("Join", scanIdx)
      joinIdx should be >= 0
      plan.substring(joinIdx, scanIdx) should not include "Exchange"
    } finally edgeDeg.unpersist()
  }
}
