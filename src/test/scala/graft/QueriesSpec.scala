package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Registry sanity + flagship smoke. Full per-query correctness runs
  * through the DuckDB differential gate (tools/oracle_check.py, driver
  * t2) — these specs pin the contract shape instead of re-running it.
  */
class QueriesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("registry names are unique") {
    val names = SparkEntry.registry.map(_.name)
    names.distinct.size shouldBe names.size
  }

  test("every oracle key has a query") {
    SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet) shouldBe true
  }

  test("flagship entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query analyzes against sf0.001 (schema resolves)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) {
        noException should be thrownBy fn(spark, sf).schema
      }
    }
  }

  test("no query leaves cached RDDs behind after executing") {
    // Cache hygiene: a builder may cache during its own eager work
    // (dedup_clusters' probe) but must release everything it pinned —
    // in a long-lived server session, per-query leaks accumulate until
    // the storage pool squeezes out shuffle memory. Exchange-reuse
    // barriers (graph/PQ/event queries) materialize in shuffle files
    // precisely so nothing needs pinning.
    spark.catalog.clearCache()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(name) {
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        spark.sparkContext.getPersistentRDDs shouldBe empty
      }
    }
  }

  test("Tables.events is pure: reads any ts unit on a foreign session, mutates no conf") {
    // newSession shares the SparkContext but owns its SQLConf — a stand-in
    // for a foreign caller that didn't build the session the graft way.
    // Works whether the fixture carries TIMESTAMP(NANOS) (needs the
    // pinned-long sidestep) or TIMESTAMP(MICROS); either way the reader
    // must not lean on the session-wide legacy flag.
    val s2 = spark.newSession()
    s2.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    Tables.events(s2, sf).count() should be > 0L
    s2.conf.getOption("spark.sql.legacy.parquet.nanosAsLong") should not be Some("true")
    Tables.events(s2, sf).schema("ts").dataType shouldBe org.apache.spark.sql.types.TimestampType
  }

  test("bm25 accepts a caller-supplied term list; the default matches the registered query") {
    val custom = graft.queries.SearchQueries.bm25(spark, sf, Seq("spark", "etl"))
    custom.columns.toSeq shouldBe Seq("doc_id", "tf1", "tf2", "bm25")
    custom.count() should be > 0L
    // the registered oracle-checked query IS the defaulted call
    val registered = SparkEntry.queries("bm25_search")(spark, sf)
    val defaulted = graft.queries.SearchQueries.bm25(spark, sf)
    registered.columns.toSeq shouldBe defaulted.columns.toSeq
    registered.exceptAll(defaulted).count() shouldBe 0L
  }

  test("oracled queries alias columns identically to their SQL (spot-check)") {
    // The driver sorts columns by name before hashing — Spark and oracle
    // column sets must match exactly (SURVEY.md §7.1).
    val q = SparkEntry.queries("agg_group_sum")(spark, sf)
    q.columns.toSeq shouldBe Seq(
      "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
      "sum_disc_price", "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order",
    )
  }
}
