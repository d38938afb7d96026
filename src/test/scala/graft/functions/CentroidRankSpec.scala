package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled [[NearestCentroidL2]] / [[CentroidRankCos]] kernels
  * against the higher-order-function formulations they replaced (r21
  * optimization: Lloyd/IVF assignment as a projection instead of a
  * crossJoin + window): same folds, same (score, cid) ordering and
  * tiebreaks, bit-for-bit — so swapping them into oracled queries cannot
  * change a hash-compared result.
  */
class CentroidRankSpec extends AnyFunSuite with graft.SparkSpec {

  import spark.implicits._

  private def randVec(rnd: scala.util.Random, dim: Int): Seq[Double] =
    Seq.fill(dim)(rnd.nextFloat().toDouble * 2 - 1) // float32-derived, like the fixture

  test("nearest_centroid_l2 equals the array_sort/transform HOF form, including d2 bits") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(42)
    val dim = 16
    val rows = (1L to 200L).map(i => (i, randVec(rnd, dim)))
    // duplicate centroid vectors force d2 TIES so the cid tiebreak is exercised
    val dup = randVec(rnd, dim)
    val cents = (1L to 6L).map(c => (c, randVec(rnd, dim))) ++ Seq((7L, dup), (8L, dup))
    val blocks = rows.toDF("vec_id", "sv")
    val cbs = cents.toDF("cid", "cv").agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbs"))
    val both = blocks.crossJoin(broadcast(cbs)).select(
      col("vec_id"),
      expr("nearest_centroid_l2(sv, cbs)").as("fast"),
      expr(
        """element_at(array_sort(transform(cbs, c -> struct(
          |  aggregate(zip_with(sv, c.cv, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v) AS d2,
          |  c.cid AS cid))), 1)""".stripMargin).as("slow"),
    )
    val mismatch = both.where(col("fast.d2") =!= col("slow.d2") || col("fast.cid") =!= col("slow.cid"))
    assert(mismatch.count() === 0L)
    // the duplicate-centroid tie must resolve to the LOWER cid (7, never 8)
    val tieHits = both.where(col("fast.cid") === 8L).count()
    assert(tieHits === 0L)
  }

  test("centroid_rank_cos equals the array_sort/transform HOF form element-for-element") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val dim = 64
    val rows = (1L to 200L).map(i => (i, randVec(rnd, dim)))
    val dup = randVec(rnd, dim)
    val cents = (1L to 14L).map(c => (c, randVec(rnd, dim))) ++ Seq((15L, dup), (16L, dup))
    val vsDf = rows.toDF("vec_id", "v")
    val cbs = cents.toDF("cid", "cv").agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbs"))
    val both = vsDf.crossJoin(broadcast(cbs)).select(
      col("vec_id"),
      expr("centroid_rank_cos(v, cbs)").as("fast"),
      expr("array_sort(transform(cbs, c -> struct(-cosine_similarity(v, c.cv) AS na, c.cid AS cid)))").as("slow"),
    )
    // full-array equality: every rank position, both fields, bit-exact
    val mismatch = both.where(not(col("fast") <=> col("slow")))
    assert(mismatch.count() === 0L)
  }

  test("both kernels are NULL on ragged centroid widths") {
    GraftFunctions.register(spark)
    val df = Seq((1L, Seq(1.0, 2.0))).toDF("vec_id", "sv")
      .withColumn("cbs", expr("array(struct(CAST(1 AS BIGINT) AS cid, array(CAST(1.0 AS DOUBLE)) AS cv))"))
    val out = df.select(
      expr("nearest_centroid_l2(sv, cbs)").as("a"),
      expr("centroid_rank_cos(sv, cbs)").as("b"),
    ).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
