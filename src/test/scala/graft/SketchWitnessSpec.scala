package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Accuracy witnesses for the three sketch queries that run rows-only
  * at the oracle gate (estimates are engine-specific, so DuckDB can't
  * differential-test them). Each query carries its exact value in-row;
  * these specs pin the estimate inside the sketch's published error
  * envelope, so a broken sketch config (or a miswired column) fails a
  * test even without an oracle.
  */
class SketchWitnessSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("agg_approx_distinct: HLL++ estimate within 3x the default 5% rsd of the exact count") {
    val s = spark
    import s.implicits._
    val rows = SparkEntry.queries("agg_approx_distinct")(s, sf)
      .select("approx_parts", "exact_parts").as[(Long, Long)].collect()
    rows should not be empty
    rows.foreach { case (approx, exact) =>
      math.abs(approx - exact).toDouble should be <= math.max(0.15 * exact, 2.0)
    }
  }

  test("agg_approx_quantile: rank error of the approximate percentiles within the 1/accuracy bound") {
    val s = spark
    import s.implicits._
    // percentile_approx(accuracy=1000) guarantees a returned element
    // whose rank is within n/1000 of the target rank; verify against
    // the raw column, with a small cushion for tie plateaus.
    val approx = SparkEntry.queries("agg_approx_quantile")(s, sf)
      .select("l_returnflag", "approx_median", "approx_p99").as[(String, Double, Double)].collect()
    approx should not be empty
    val li = Tables.lineitem(s, sf).select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .as[(String, Double)].collect().groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    approx.foreach { case (flag, med, p99) =>
      val xs = li(flag)
      def rankRange(v: Double): (Double, Double) =
        (xs.count(_ < v).toDouble / xs.length, xs.count(_ <= v).toDouble / xs.length)
      Seq((med, 0.5), (p99, 0.99)).foreach { case (v, q) =>
        val (lo, hi) = rankRange(v)
        withClue(s"$flag q=$q value=$v rank=[$lo,$hi]: ") {
          lo should be <= q + 0.005
          hi should be >= q - 0.005
        }
      }
    }
  }

  test("dedup_bloom_guard: no false negatives, and the FP rate stays sane") {
    val s = spark
    import s.implicits._
    val (nBatch, nDefNew, nTrulyNew) = SparkEntry.queries("dedup_bloom_guard")(s, sf)
      .as[(Long, Long, Long)].head()
    nBatch should be > 0L
    // a bloom never misses a seen element, so everything it clears as
    // "definitely new" must actually be new…
    nDefNew should be <= nTrulyNew
    // …and with 8 bits/item the FP rate is ~2-3%, so nearly all truly
    // new docs clear the filter
    nDefNew.toDouble should be >= 0.8 * nTrulyNew
  }

  test("agg_heavy_hitters: combined shard sketches report EXACT counts below maxItemsTracked") {
    val s = spark
    import s.implicits._
    val got = SparkEntry.queries("agg_heavy_hitters")(s, sf).as[(String, Long)].collect()
    got.length shouldBe 3
    val exact = Tables.events(s, sf).groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    // 5 distinct types << 64 tracked => every reported count is exact,
    // and the reported set is a true top-3 (ties may reorder items)
    got.foreach { case (item, n) => n shouldBe exact(item) }
    val third = exact.values.toSeq.sorted(Ordering[Long].reverse)(2)
    all(got.map(_._2)) should be >= third
  }

  test("agg_theta_set_ops: intersection/difference estimates are exact below the theta nominal size") {
    val s = spark
    import s.implicits._
    val r = SparkEntry.queries("agg_theta_set_ops")(s, sf).collect().head
    def l(name: String) = r.getAs[Long](name)
    l("exact_a") should be > 0L
    l("est_a") shouldBe l("exact_a")
    l("est_b") shouldBe l("exact_b")
    l("est_both") shouldBe l("exact_both")
    l("est_only_a") shouldBe l("exact_only_a")
    // the algebra itself: |A| = |A ∩ B| + |A \ B|
    l("est_a") shouldBe l("est_both") + l("est_only_a")
  }

  test("agg_theta_set_ops: past the exact-mode bound the query fails with the NAMED guard error, never a silent estimate the oracle would surface as a bare hash mismatch (r19 prescription 3)") {
    val s = spark
    // a fixture whose filtered purchase-user set has 70 000 DISTINCT
    // members — past the lgK=16 guard (61 440) and past k = 2^16
    // itself, the regime where estimate == exact stops being an
    // identity
    val dir = java.nio.file.Files.createTempDirectory("graft-theta-bound")
    try {
      s.range(70000)
        .select(
          col("id").as("event_id"),
          lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00")).as("ts"),
          col("id").as("user_id"),
          lit("purchase").as("event_type"),
          lit(90.0).as("value"),
          lit("{}").as("props"),
        )
        .write.parquet(dir.resolve("events.parquet").toString)
      val e = intercept[Exception] {
        SparkEntry.queries("agg_theta_set_ops")(s, dir.toString).collect()
      }
      def chain(t: Throwable): String =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(c => Option(c.getMessage).getOrElse("")).mkString("\n")
      chain(e) should include("theta exact-mode bound")
    } finally Fs.rmTree(dir.toFile)
  }

  test("agg_hll_sketch_merge: merged DataSketches estimate within 3x the lgK=12 ~1.6% rse of exact") {
    val s = spark
    import s.implicits._
    val (est, exact) = SparkEntry.queries("agg_hll_sketch_merge")(s, sf)
      .select(col("est_distinct_users").cast("double"), col("exact_distinct_users").cast("double"))
      .as[(Double, Double)].head()
    exact should be > 0.0
    math.abs(est - exact) should be <= math.max(0.05 * exact, 2.0)
  }

  test("agg_count_min: one-sided CMS bound holds for every user, not just the reported top-5") {
    val s = spark
    import s.implicits._
    // replay the query's shard-sketch + merge pipeline so the bound can
    // be probed at EVERY key (the registered query reports top-5 rows)
    val events = Tables.events(s, sf)
    val merged = events.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
      .select("sk").as[Array[Byte]].collect()
      .map(b => org.apache.spark.util.sketch.CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (x, y) => x.mergeInPlace(y); x }
    val exact = events.groupBy("user_id").count().as[(Long, Long)].collect()
    val n = exact.map(_._2).sum
    exact.length should be > 10
    exact.foreach { case (u, c) =>
      val est = merged.estimateCount(u)
      withClue(s"user $u: ") {
        est should be >= c // CMS never undercounts
        est should be <= c + math.max(1L, math.ceil(0.001 * n).toLong) // eps·N overcount cap
      }
    }
    // and the registered query's in-row witness agrees with this replay
    val rows = SparkEntry.queries("agg_count_min")(s, sf).as[(Long, Long, Long)].collect()
    rows should have size 5
    rows.foreach { case (u, ex, est) =>
      ex shouldBe exact.toMap.apply(u)
      est shouldBe merged.estimateCount(u)
    }
  }
}
