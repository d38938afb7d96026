package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Physical join strategy coverage (SURVEY.md §2.2 "joins — all kinds"):
  * the same logical equi-join plans as broadcast-hash, shuffled-hash, or
  * sort-merge depending on hints/thresholds — results identical. At
  * 100 TB the choice is the difference between a local probe and a
  * full-fact shuffle, so the engine must reach all three deliberately.
  */
class JoinStrategiesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)
  private def customer = Tables.customer(spark, sf)
  private def joined(hint: String) =
    orders.join(customer.hint(hint), col("o_custkey") === col("c_custkey"))

  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("broadcast hint plans BroadcastHashJoin") {
    physical(joined("broadcast")) should include("BroadcastHashJoin")
  }

  test("shuffle_hash hint plans ShuffledHashJoin") {
    physical(joined("shuffle_hash")) should include("ShuffledHashJoin")
  }

  test("merge hint plans SortMergeJoin") {
    physical(joined("merge")) should include("SortMergeJoin")
  }

  test("non-equi predicate falls back to nested-loop") {
    val nlj = orders.join(customer, col("o_totalprice") > col("c_acctbal") * 100)
    physical(nlj) should include("NestedLoopJoin")
  }

  test("all equi strategies agree on the result") {
    val expected = joined("broadcast").count()
    joined("shuffle_hash").count() shouldBe expected
    joined("merge").count() shouldBe expected
  }
}
