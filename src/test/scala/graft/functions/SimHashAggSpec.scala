package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled [[SimHashAgg]] aggregate against the 64-column
  * formulation it replaced in the `dedup_simhash*` kernels (r21
  * optimization): same exact integer vote sums, same `> 0` threshold,
  * same disjoint single-bit OR assembly — including vote TIES (sum 0),
  * null hash halves, and all-null groups.
  */
class SimHashAggSpec extends AnyFunSuite with graft.SparkSpec {

  import spark.implicits._

  /** The exact 64-column spelling simhashFp used before the aggregate. */
  private def columnForm(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val voteAggs = (0 until 64).map { j =>
      val src = if (j < 32) s"(h_lo >> $j)" else s"(h_hi >> ${j - 32})"
      sum(expr(s"2 * ($src & 1) - 1")).as(s"v$j")
    }
    df.groupBy("doc_id")
      .agg(voteAggs.head, voteAggs.tail: _*)
      .select(
        col("doc_id"),
        (0 until 64).map(j => when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L)))
          .reduce(_ bitwiseOR _).as("simhash"),
      )
  }

  test("simhash_agg equals the 64-column vote formulation, including ties and bit 63") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(2024)
    // random 32-bit halves; EVEN group sizes force exact vote ties
    // (sum 0) on ~half the bits, exercising the > 0 (not >= 0) edge
    val rows = (1L to 400L).flatMap { doc =>
      val n = 2 * (1 + rnd.nextInt(6)) // even: ties are common
      (1 to n).map(_ => (doc, rnd.nextInt().toLong & 0xFFFFFFFFL, rnd.nextInt().toLong & 0xFFFFFFFFL))
    }
    val df = rows.toDF("doc_id", "h_lo", "h_hi")
    val fast = df.groupBy("doc_id").agg(expr("simhash_agg(h_lo, h_hi)").as("simhash"))
    val slow = columnForm(df)
    val joined = fast.as("f").join(slow.as("s"), "doc_id")
    assert(joined.where(col("f.simhash") =!= col("s.simhash")).count() === 0L)
    // bit 63 must be reachable (h_hi bit 31) — prove at least one doc set it
    assert(fast.where(col("simhash") < 0L).count() > 0L)
  }

  test("null halves vote per half, exactly like sum-over-null terms; all-null group -> 0") {
    GraftFunctions.register(spark)
    val df = Seq[(Long, Option[Long], Option[Long])](
      (1L, Some(0xFFFFFFFFL), Some(0xFFFFFFFFL)), // all-ones vote on both halves
      (1L, None, Some(5L)),                       // lo null -> ONLY the hi half votes
      (1L, Some(5L), None),                       // hi null -> ONLY the lo half votes
      (2L, None, None),                           // all-null group
    ).toDF("doc_id", "h_lo", "h_hi")
    val fast = df.groupBy("doc_id").agg(expr("simhash_agg(h_lo, h_hi)").as("simhash"))
      .orderBy("doc_id").as[(Long, Long)].collect()
    val slow = columnForm(df).orderBy("doc_id").as[(Long, Long)].collect()
    assert(fast === slow)
    // doc 1 hand-derived: per half, bits 0 and 2 get two +1 votes (the
    // all-ones row plus the 5-row), every other bit ties 1-1 at 0 — so
    // exactly {0, 2, 32, 34} are set. A whole-row skip would instead
    // leave only the all-ones row and set all 64 bits (-1L).
    assert(fast(0)._2 === ((1L << 0) | (1L << 2) | (1L << 32) | (1L << 34)))
    assert(fast(1)._2 === 0L)
  }

  test("partial aggregation: repartitioned input yields the identical fingerprint") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1L to 50L).flatMap { doc =>
      (1 to 40).map(_ => (doc, rnd.nextInt().toLong & 0xFFFFFFFFL, rnd.nextInt().toLong & 0xFFFFFFFFL))
    }
    val one = rows.toDF("doc_id", "h_lo", "h_hi").coalesce(1)
      .groupBy("doc_id").agg(expr("simhash_agg(h_lo, h_hi)").as("simhash"))
    val many = rows.toDF("doc_id", "h_lo", "h_hi").repartition(16)
      .groupBy("doc_id").agg(expr("simhash_agg(h_lo, h_hi)").as("simhash"))
    assert(one.as("a").join(many.as("b"), "doc_id")
      .where(col("a.simhash") =!= col("b.simhash")).count() === 0L)
  }
}
