package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** Distribution witness for the Efraimidis–Spirakis sampler (the
  * SketchWitnessSpec pattern: no row-level oracle — the ln(u)/w key is
  * transcendental, so cross-engine float ordering near ties is not
  * contractual — but the LAWS are pinned exactly and the distribution
  * statistically against closed-form binomial bounds).
  */
class WeightedSampleSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // note: expr, not functions.size — ScalaTest's Matchers shadows `size`
  private def weightedDocs = Tables.documents(spark, sf)
    .withColumn("weight", expr("CAST(size(split(text, ' ')) AS DOUBLE)"))

  test("deterministic in (data, seed); different seeds draw different samples") {
    val a = WeightedSample.sample(weightedDocs, 50, col("doc_id"), col("weight"), 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = WeightedSample.sample(weightedDocs, 50, col("doc_id"), col("weight"), 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val c = WeightedSample.sample(weightedDocs, 50, col("doc_id"), col("weight"), 8L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    a shouldBe b
    a.size shouldBe 50
    c should not be a
  }

  test("without replacement: k distinct rows; k >= n returns every positive-weight row") {
    val s = spark
    import s.implicits._
    val items = Seq((1L, 2.0), (2L, 5.0), (3L, 1.0), (4L, 0.0), (5L, -3.0), (6L, 9.0))
      .toDF("id", "w")
    val all = WeightedSample.sample(items, 100, col("id"), col("w"), 1L)
      .select("id").as[Long].collect().sorted.toSeq
    // zero/negative weights are outside the sampler's domain — never drawn
    all shouldBe Seq(1L, 2L, 3L, 6L)
    val two = WeightedSample.sample(items, 2, col("id"), col("w"), 1L)
      .select("id").as[Long].collect().toSeq
    two.distinct.size shouldBe 2
  }

  test("k=1 inclusion frequency matches w_i / sum(w) within 5-sigma binomial bounds") {
    val s = spark
    import s.implicits._
    // 8 items, weights 1..8 (W = 36); 4000 seeds in ONE plan: key every
    // (item, seed) pair with the operator's exact arithmetic, take each
    // seed's argmax — the E-S k=1 winner — and count wins per item.
    val weights = (1 to 8).map(i => (i.toLong, i.toDouble))
    val r = 4000
    val items = weights.toDF("id", "w")
    val seeds = spark.range(r.toLong).toDF("seed")
    val winners = items.crossJoin(seeds)
      .withColumn("key", WeightedSample.esKey(col("id"), col("w"), col("seed")))
      .withColumn("rn", row_number().over(Window.partitionBy("seed").orderBy(desc("key"))))
      .where(col("rn") === 1)
      .groupBy("id").agg(count(lit(1)).as("wins"))
      .as[(Long, Long)].collect().toMap
    val totalW = weights.map(_._2).sum
    weights.foreach { case (id, w) =>
      val p = w / totalW
      val mean = r * p
      val sigma = math.sqrt(r * p * (1 - p))
      val wins = winners.getOrElse(id, 0L).toDouble
      withClue(s"item $id (w=$w): wins $wins, expect $mean ± ${5 * sigma}") {
        math.abs(wins - mean) should be <= 5 * sigma
      }
    }
  }

  test("registered query draws k rows biased toward heavy documents") {
    val sample = graft.SparkEntry.queries("sample_weighted")(spark, sf)
    val rows = sample.collect()
    rows.length shouldBe 100
    // weight bias: the sampled mean token weight must exceed the corpus
    // mean (probability ∝ tokens); an unweighted draw would match it
    val sampledMean = rows.map(_.getDouble(2)).sum / rows.length
    val corpusMean = weightedDocs.agg(avg("weight")).head().getDouble(0)
    sampledMean should be > corpusMean
  }
}
