package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins the PageRank iteration's shuffle shape: the edge relation is
  * cached pre-partitioned on the join key (`src`), so each iteration
  * shuffles only the small rank side — the cached big side must join
  * straight out of the cache with NO shuffle between the join and the
  * InMemoryTableScan. At 100 TB this is the difference between moving
  * the edge relation once vs once per iteration.
  *
  * The assertion walks the physical-plan TREE (through AQE query-stage
  * wrappers) rather than slicing the plan string: a BroadcastExchange
  * of the small rank side is a *good* plan and must not trip the pin,
  * and string offsets can't tell which side of the join a node sits
  * on. Broadcast is disabled for the test so the join is a shuffle
  * join — the regime where cached-partitioning reuse actually matters
  * (with a broadcast join the streamed side trivially has no shuffle
  * and the pin would pass even without the repartition).
  */
class GraphPlanSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Unwrap AQE adapters so children traversal sees the real operators.
    * ReusedExchangeExec unwraps to the exchange it reuses: a reused
    * shuffle IS a shuffle for the pin's purposes — without this arm an
    * AQE exchange-reuse on the rank side would hide its
    * ShuffleExchangeExec and fail the "rank side shuffles" assertion
    * spuriously.
    */
  private def unwrap(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    case q: QueryStageExec        => unwrap(q.plan)
    case r: ReusedExchangeExec    => unwrap(r.child)
    case other                    => other
  }

  private def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] = {
    val here = unwrap(p)
    pf.lift(here).toSeq ++ here.children.flatMap(c => collectAll(c)(pf))
  }

  private def planFor(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.collect() // force AQE to finalize the plan
    unwrap(df.queryExecution.executedPlan)
  }

  /** Children of the join that contains the InMemoryTableScan,
    * partitioned into (cached side, other sides).
    */
  private def joinSides(root: SparkPlan): (Seq[SparkPlan], Seq[SparkPlan]) = {
    def hasCacheScan(p: SparkPlan): Boolean =
      collectAll(p) { case s: InMemoryTableScanExec => s }.nonEmpty
    val join = collectAll(root) { case j: BaseJoinExec => j }
      .find(hasCacheScan)
      .getOrElse(fail("no join over the cached relation in the plan"))
    join.children.partition(hasCacheScan)
  }

  private def iterate(edgeDeg: org.apache.spark.sql.DataFrame,
                      rank: org.apache.spark.sql.DataFrame) =
    rank.join(edgeDeg, col("src") === col("node"))
      .select(col("dst").as("node2"), expr("rank div outdeg").as("contrib"))
      .groupBy(col("node2").as("node"))
      .agg(expr("150000000 + (85 * sum(contrib)) div 100").as("rank"))

  test("pre-partitioned cached edges join without a fresh shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force a shuffle join: under broadcast the streamed side never has
    // an Exchange regardless of the cache layout, and the pin would be
    // vacuous — the property only bites in the shuffle-join regime
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val e = spark.range(1000).select(
      (col("id") % 97).as("src"), (col("id") % 31).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edgeDeg = e.join(deg, "src").repartition(col("src")).cache()
    try {
      edgeDeg.count() // materialize
      val rank = deg.select(col("src").as("node"), lit(1000000000L).as("rank"))
      val (cachedSides, otherSides) = joinSides(planFor(iterate(edgeDeg, rank)))

      cachedSides should have size 1
      withClue("cached edge side must stream straight out of the cache:") {
        collectAll(cachedSides.head) { case s: ShuffleExchangeExec => s } shouldBe empty
      }
      withClue("rank side is the one that shuffles:") {
        collectAll(otherSides.head) { case s: ShuffleExchangeExec => s } should not be empty
      }
    } finally {
      edgeDeg.unpersist()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("without the pre-partition the cached side re-shuffles (pin is not vacuous)") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val e = spark.range(1000).select(
      (col("id") % 97).as("src"), (col("id") % 31).as("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // same relation, cached with a round-robin repartition that destroys
    // the key layout: join must add an Exchange above the cache scan —
    // proves the main pin would fail on a wrongly-partitioned cache
    val edgeDeg = e.join(deg, "src").repartition(4).cache()
    try {
      edgeDeg.count()
      val rank = deg.select(col("src").as("node"), lit(1000000000L).as("rank"))
      val (cachedSides, _) = joinSides(planFor(iterate(edgeDeg, rank)))
      cachedSides should have size 1
      collectAll(cachedSides.head) { case s: ShuffleExchangeExec => s } should not be empty
    } finally {
      edgeDeg.unpersist()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
