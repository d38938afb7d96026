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

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val s = spark
    val old = pairs.map { case (k, _) => k -> s.conf.getOption(k) }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the adaptive plan)") {
    // The runtime complement of operators.Skew's manual salting: AQE
    // detects an oversized post-shuffle partition and splits it into
    // parallel sub-joins. Thresholds are lowered so the fixture's skew
    // (90% of rows on one key) crosses them; at 100 TB the defaults
    // (256 MB) play the same role. Broadcast is disabled so the join
    // actually shuffles — skew handling only applies to SMJ/SHJ.
    val s = spark
    import s.implicits._
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
    ) {
      val fact = s.range(0, 200000L)
        .select(when(col("id") % 10 < 9, lit(1L)).otherwise(col("id") % 1000).as("k"), col("id").as("v"))
      val dim = s.range(0, 1000L)
        .select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
      val j = fact.join(dim, "k")
      // collect() drives THIS DataFrame's QueryExecution, finalizing its
      // adaptive plan (count() would plan a separate aggregate query and
      // leave j's own plan unfinalized)
      j.collect().length shouldBe 200000
      // the executed adaptive plan marks the split join "skew=true"
      j.queryExecution.executedPlan.toString should include("skew=true")
    }
  }

  test("co-bucketed tables sort-merge join with ZERO shuffle exchanges") {
    // Bucketing is the pre-paid shuffle: both tables are written
    // hash-partitioned (and sorted) on the join key, so the join needs
    // no Exchange at read time — at 100 TB this converts every
    // fact-to-fact join on the bucket key from a full-data shuffle into
    // a local merge. The write path is the standard DataFrameWriter
    // bucketBy/sortBy; external `path` keeps the catalog entry out of a
    // warehouse dir.
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val a = s.range(0, 10000L).select(col("id").as("k"), (col("id") * 2).as("va"))
    val b = s.range(0, 10000L).select(col("id").as("k"), (col("id") * 3).as("vb"))
    // A crashed prior run can leave the catalog entries behind (the
    // finally-cleanup never ran); saveAsTable would then throw before
    // this run's try/finally is even entered.
    s.sql("DROP TABLE IF EXISTS graft_bucket_a")
    s.sql("DROP TABLE IF EXISTS graft_bucket_b")
    a.write.bucketBy(4, "k").sortBy("k").option("path", s"$dir/ta").saveAsTable("graft_bucket_a")
    b.write.bucketBy(4, "k").sortBy("k").option("path", s"$dir/tb").saveAsTable("graft_bucket_b")
    try {
      withConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.sources.bucketing.enabled" -> "true",
      ) {
        val j = s.table("graft_bucket_a").join(s.table("graft_bucket_b"), "k")
        j.count() shouldBe 10000L
        val plan = physical(j)
        plan should include("SortMergeJoin")
        (plan should not).include("Exchange hashpartitioning")
      }
    } finally {
      s.sql("DROP TABLE IF EXISTS graft_bucket_a")
      s.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("runtime bloom filter from the dim side prunes the fact scan (InjectRuntimeFilter)") {
    // Catalyst's runtime-filter rule builds a bloom filter over the
    // filtered (selective) creation side and injects might_contain on
    // the application side BELOW its shuffle — at 100 TB the fact rows
    // that would miss the join die at the scan instead of crossing the
    // wire. Thresholds are lowered so the tiny fixture qualifies; the
    // rule needs file-relation stats, hence the temp parquet tables.
    val s = spark
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    s.range(0, 100000L)
      .select(col("id").as("k"), (col("id") % 97).as("v"))
      .write.parquet(s"$dir/fact")
    s.range(0, 5000L)
      .select(col("id").as("k"), (col("id") % 13).as("cat"))
      .write.parquet(s"$dir/dim")
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
    ) {
      val fact = s.read.parquet(s"$dir/fact")
      val dim = s.read.parquet(s"$dir/dim").where(col("cat") === 3)
      val j = fact.join(dim, "k")
      j.queryExecution.optimizedPlan.toString should include("might_contain")
      // dim keys ≡ 3 (mod 13) in [0, 5000) → 385 of them, each matching
      // exactly one fact row
      j.count() shouldBe 385L
    }
  }

  // ---- sketch-driven differentiated skew join (operators.Skew.autoSkewJoin)

  private def skewProbe = Tables.lineitem(spark, sf).select(
    expr("CAST(CASE WHEN l_orderkey % 10 != 0 THEN 0 ELSE l_orderkey % 97 END AS BIGINT)").as("k"),
    col("l_quantity"),
  )
  private def skewBuild = Tables.supplier(spark, sf)
    .groupBy(expr("CAST(s_suppkey % 97 AS BIGINT)").as("k"))
    .agg(count(lit(1)).as("n_sup"))

  test("hotKeys finds the planted 90% key from one sketch pass") {
    val hot = operators.Skew.hotKeys(skewProbe, "k", hotShare = 0.2)
    hot.map(_.asInstanceOf[Long]) shouldBe Seq(0L)
    // nothing is hot at a threshold above the hottest key's share
    operators.Skew.hotKeys(skewProbe, "k", hotShare = 0.95) shouldBe Seq.empty
  }

  test("autoSkewJoin equals the plain join and broadcasts only the hot keys' build rows") {
    val auto = operators.Skew.autoSkewJoin(skewProbe, skewBuild, "k", hotShare = 0.2)
    val plain = skewProbe.join(skewBuild, Seq("k"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k").agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
    agg(auto) shouldBe agg(plain)
    // the hot path is a broadcast join; the cold path still shuffle-joins
    val plan = auto.queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
  }

  test("autoSkewJoin with no hot key degenerates to the plain join") {
    // uniform keys: nothing clears a 50% share
    val uni = skewProbe.where(col("k") =!= 0L)
    val auto = operators.Skew.autoSkewJoin(uni, skewBuild, "k", hotShare = 0.5)
    auto.count() shouldBe uni.join(skewBuild, Seq("k")).count()
  }
}
