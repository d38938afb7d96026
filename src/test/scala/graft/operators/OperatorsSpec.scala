package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

class OperatorsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("saltedAgg equals plain aggregation on a skewed distribution") {
    val s = spark
    import s.implicits._
    // 90% of rows on one hot key
    val skewed = spark.range(10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("k"), col("id").as("v"))
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("total"), sum(lit(1L)).as("n"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val salted = Skew.saltedAgg(skewed, "k", 8, Map("total" -> col("v"), "n" -> lit(1L)))
      .select("k", "total", "n")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    salted shouldBe plain
  }

  test("saltedDistinct and saltedCollectSet equal the plain DISTINCT forms and split the hot key's state") {
    val s = spark
    import s.implicits._
    // 90% of rows on one hot key, values cycling 0..96
    val skewed = spark.range(20000)
      .select(
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 13).as("k"),
        (col("id") % 97).as("v"),
      )
    val plainD = skewed.groupBy("k").agg(count_distinct(col("v")).as("n_distinct"))
      .as[(Long, Long)].collect().sortBy(_._1)
    Skew.saltedDistinct(skewed, "k", "v", 8)
      .as[(Long, Long)].collect().sortBy(_._1) shouldBe plainD

    val plainS = skewed.groupBy("k").agg(sort_array(collect_set(col("v"))).as("values"))
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    val saltedS = Skew.saltedCollectSet(skewed, "k", "v", 8)
      .as[(Long, Seq[Long])].collect().sortBy(_._1)
    saltedS shouldBe plainS

    // the partial phase really does group on (key, value-salt): the hot
    // key's 97 distinct values spread across all 8 sub-groups
    val subGroups = skewed.where(col("k") === 7L)
      .select(pmod(xxhash64(col("v")), lit(8L)).as("s")).distinct().count()
    subGroups shouldBe 8L
  }

  test("saltedJoin equals plain join on a skewed probe side") {
    val s = spark
    import s.implicits._
    val orders = Tables.orders(spark, sf)
    val probe = orders.select(
      when(col("o_orderkey") % 5 =!= 0, lit(1L)).otherwise(col("o_custkey")).as("c_custkey"),
      col("o_orderkey"),
    )
    val build = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val plain = probe.join(build, Seq("c_custkey"))
      .select("c_custkey", "o_orderkey", "c_name")
      .as[(Long, Long, String)].collect().sorted
    val salted = Skew.saltedJoin(probe, build, "c_custkey", 8)
      .select("c_custkey", "o_orderkey", "c_name")
      .as[(Long, Long, String)].collect().sorted
    salted shouldBe plain
  }

  test("TopKAggregator matches window rank per group") {
    val s = spark
    import s.implicits._
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    val topk = udaf(new TopKAggregator(3))
    val viaAgg = orders.toDF("cust", "okey", "price")
      .groupBy("cust")
      .agg(topk(col("okey"), col("price")).as("top"))
      .select(col("cust"), explode(col("top")).as("p"))
      .select(col("cust"), col("p._2").as("okey"))
      .as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"))
      .as[(Long, Long)].collect().toSet
    viaAgg shouldBe viaWindow
  }
}
