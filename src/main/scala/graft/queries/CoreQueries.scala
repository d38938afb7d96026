package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator inventory (SURVEY.md §2.2 / §7.3): scans, joins,
  * aggregations, windows, sorts, set ops, and scalar function families.
  *
  * Every query is declarative DataFrame API so Catalyst gets predicate
  * pushdown / column pruning / join selection for free; small dimensions
  * are broadcast explicitly where the plan must stay shuffle-free at
  * scale.
  */
object CoreQueries {
  private def r2(c: Column) = round(c, 2)

  /** Exact money aggregation: Spark's `round` (HALF_UP on the decimal
    * string) and DuckDB's (`floor(x*10^n+0.5)` on the binary double)
    * disagree on ties, so for on-grid money columns we aggregate exactly
    * in DECIMAL and cast the exact result to DOUBLE — bit-identical on
    * both engines, no rounding step at all. (SURVEY.md §7.6 hazard 2.)
    */
  private def moneySum(c: String) =
    expr(s"CAST(sum(CAST($c AS DECIMAL(12,2))) AS DOUBLE)")

  val qs: Seq[Q] = Seq(

    // ----- aggregation: group-by with sum/avg/count (flagship, TPC-H Q1 shape)
    Q(
      "agg_group_sum",
      """SELECT l_returnflag, l_linestatus,
        | sum(l_quantity) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        | sum(l_quantity) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        | CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    ) { (s, d) =>
      // filter + project BEFORE the fanout so the added exchange carries
      // only surviving rows and needed columns; fanout (100-TB no-op)
      // parallelizes the DECIMAL partial aggregation off the
      // single-row-group scan (r21 — see Tables.fanout)
      Tables.fanout(
        Tables.lineitem(s, d)
          .where(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
          .select("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          moneySum("l_extendedprice").as("sum_base_price"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)").as("sum_disc_price"),
          expr("CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)").as("sum_charge"),
          (sum("l_quantity") / count(lit(1))).as("avg_qty"),
          (moneySum("l_extendedprice") / count(lit(1))).as("avg_price"),
          (expr("CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ----- scan with filter + projection (pushdown/pruning demo)
    Q(
      "scan_filter_project",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_shipdate
        |FROM lineitem WHERE l_quantity >= 45 AND l_discount <= 0.02
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_quantity") >= 45 && col("l_discount") <= 0.02)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // ----- inner equi-join
    Q(
      "join_inner",
      """SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_totalprice > 450000 ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .where(col("o_totalprice") > 450000)
        .select("o_orderkey", "c_name", "c_mktsegment", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ----- left outer join + aggregation over the nullable side
    Q(
      "join_left",
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders,
        |       coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 0) AS big_total
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 300000), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
          count("o_orderkey").as("n_big_orders"),
          coalesce(moneySum("o_totalprice"), lit(0.0)).as("big_total"),
        )
        .orderBy("c_custkey")
    },

    // ----- left-semi join (EXISTS)
    Q(
      "join_semi",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 400000), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ----- left-anti join (NOT EXISTS)
    Q(
      "join_anti",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d).where(col("o_totalprice") > 400000), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // ----- star-schema join with explicitly broadcast dimensions
    Q(
      "join_broadcast_dim",
      """SELECT r_name, count(DISTINCT n_name) AS n_nations,
        |       count(*) AS n_customers,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(
          countDistinct("n_name").as("n_nations"),
          count(lit(1)).as("n_customers"),
          (moneySum("c_acctbal") / count(lit(1))).as("avg_acctbal"),
        )
        .orderBy("r_name")
    },

    // ----- equi-join with an additional range (non-equi) condition
    Q(
      "join_range",
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |       count(*) AS n_late,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS late_value
        |FROM lineitem JOIN orders
        |  ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 120 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(
          Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 120 DAYS"),
        )
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(count(lit(1)).as("n_late"), moneySum("l_extendedprice").as("late_value"))
        .orderBy("o_year")
    },

    // ----- scalar subquery: each row scaled by a whole-table aggregate
    // (exact decimal avg so both engines agree bitwise)
    Q(
      "scalar_subquery",
      """SELECT o_orderkey,
        | o_totalprice / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |                 FROM orders) AS price_ratio
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      Q.withTempViews(s)("orders_ss" -> Tables.orders(s, d)) {
        s.sql(
          """SELECT o_orderkey,
            | o_totalprice / (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
            |                 FROM orders_ss) AS price_ratio
            |FROM orders_ss ORDER BY o_orderkey""".stripMargin,
        )
      }
    },

    // ----- null-safe equality join (<=> / IS NOT DISTINCT FROM): rows
    // whose join key is NULL still pair up, unlike plain equality
    Q(
      "join_null_safe",
      """WITH l AS (SELECT o_orderkey,
        |                  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS k
        |           FROM orders),
        |r AS (SELECT DISTINCT CASE WHEN o_totalprice < 50000 THEN NULL ELSE o_orderstatus END AS k
        |      FROM orders)
        |SELECT l.o_orderkey, l.k
        |FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
        |ORDER BY l.o_orderkey""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      val l = o.select(
        col("o_orderkey"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderstatus")).as("k"),
      )
      val r = o.select(
        when(col("o_totalprice") < 50000, lit(null)).otherwise(col("o_orderstatus")).as("rk"),
      ).distinct()
      l.join(r, col("k") <=> col("rk"))
        .select(col("o_orderkey"), col("k"))
        .orderBy("o_orderkey")
    },

    // ----- distinct aggregation
    Q(
      "agg_distinct",
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |       count(DISTINCT l_suppkey) AS n_supps, count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("l_returnflag")
    },

    // ----- rollup (hierarchical grouping sets)
    Q(
      "agg_rollup",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ----- cube (all grouping sets)
    Q(
      "agg_cube",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price, count(*) AS n
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    ) { (s, d) =>
      // fanout after a 3-column projection (r21): the fixture is one
      // parquet row group, so the 4-way grouping-set Expand and the
      // DECIMAL partial aggregation otherwise run on a single core; the
      // projection keeps the added exchange narrow, and at 100 TB the
      // fanout guard makes it a no-op (Tables.fanout).
      Tables.fanout(Tables.lineitem(s, d).select("l_returnflag", "l_linestatus", "l_extendedprice"))
        .cube("l_returnflag", "l_linestatus")
        .agg(moneySum("l_extendedprice").as("sum_price"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    // ----- explicit grouping sets with grouping() markers (via spark.sql —
    // also exercises the SQL entry surface)
    Q(
      "agg_grouping_sets",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
        |       CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
        |       sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    ) { (s, d) =>
      Q.withTempViews(s)("lineitem_gs" -> Tables.lineitem(s, d)) {
        s.sql(
          """SELECT l_returnflag, l_linestatus,
            |       CAST(grouping(l_returnflag) AS INT) AS g_rf,
            |       CAST(grouping(l_linestatus) AS INT) AS g_ls,
            |       sum(l_quantity) AS sum_qty
            |FROM lineitem_gs
            |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
        )
      }
    },

    // ----- map functions: JSON payload parsed to a typed map
    Q(
      "map_funcs",
      """SELECT event_id,
        | CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
        | list_sort(json_keys(props))[1] AS first_key,
        | CAST(props->>'$.k' AS BIGINT) AS k_val
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("event_type") === "purchase")
        .withColumn("m", from_json(col("props"), lit("map<string,bigint>")))
        .select(
          col("event_id"),
          size(map_keys(col("m"))).as("n_keys"),
          array_min(map_keys(col("m"))).as("first_key"),
          col("m").getItem("k").as("k_val"),
        )
        .orderBy("event_id")
    },

    // ----- approximate distinct (HLL++). Estimates are engine-specific, so
    // no DuckDB oracle — driver records the weaker rows-only check.
    Q.noOracle("agg_approx_distinct") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          approx_count_distinct("l_partkey").as("approx_parts"),
          countDistinct("l_partkey").as("exact_parts"),
        )
        .orderBy("l_returnflag")
    },

    // ----- quantile sketch (KLL-style percentile_approx): the estimate
    // is engine-specific like HLL, so no oracle — rows-only check. The
    // accuracy witness lives in SketchWitnessSpec, which checks the
    // returned values' RANK ERROR against the raw column (an in-row
    // exact percentile would re-add the full sort the sketch exists to
    // avoid — measured +2.4 s at sf0.1, and unpayable at 100 TB). The
    // sketch is the form that survives 100 TB: mergeable partial
    // state, one pass, no sort.
    Q.noOracle("agg_approx_quantile") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx_median"),
          percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000)).as("approx_p99"),
          count(lit(1)).as("n_rows"),
        )
        .orderBy("l_returnflag")
    },

    // ----- two-phase salted aggregation (graft.operators.Skew): result is
    // identical to the plain GROUP BY the oracle runs — the salt only
    // spreads hot keys across reducers (integer sums, so order-exact)
    Q(
      "agg_salted",
      """SELECT l_suppkey, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,
    ) { (s, d) =>
      graft.operators.Skew
        .saltedAgg(
          Tables.lineitem(s, d), "l_suppkey", 8,
          Map("sum_qty" -> col("l_quantity"), "n" -> lit(1L)),
        )
        .select("l_suppkey", "sum_qty", "n")
        .orderBy("l_suppkey")
    },

    // ----- salted join for a pathological key: 90% of fact rows share
    // key 0 — one reducer would own 90% of the shuffle. saltedJoin gives
    // every fact row a uniform salt and replicates the (small) build side
    // once per salt, so the hot key spreads over 16 tasks; results are
    // identical to the plain join the oracle runs (salting only routes
    // rows). This is the explicit escape hatch for skew AQE can't split
    // (e.g. a build side too big to broadcast but a probe distribution
    // concentrated beyond AQE's partition-split granularity).
    Q(
      "join_skew_salted",
      """WITH probe AS (SELECT CAST(CASE WHEN l_orderkey % 10 <> 0 THEN 0
        |                              ELSE l_orderkey % 97 END AS BIGINT) AS k,
        |                      l_quantity
        |               FROM lineitem),
        |build AS (SELECT CAST(s_suppkey % 97 AS BIGINT) AS k, count(*) AS n_sup
        |          FROM supplier GROUP BY 1)
        |SELECT p.k, b.n_sup, count(*) AS n_li, sum(l_quantity) AS sum_qty
        |FROM probe p JOIN build b ON p.k = b.k
        |GROUP BY p.k, b.n_sup ORDER BY p.k""".stripMargin,
    ) { (s, d) =>
      val probe = Tables.lineitem(s, d).select(
        expr("CAST(CASE WHEN l_orderkey % 10 != 0 THEN 0 ELSE l_orderkey % 97 END AS BIGINT)").as("k"),
        col("l_quantity"),
      )
      val build = Tables.supplier(s, d)
        .groupBy(expr("CAST(s_suppkey % 97 AS BIGINT)").as("k"))
        .agg(count(lit(1)).as("n_sup"))
      graft.operators.Skew
        .saltedJoin(probe, build, "k", 16)
        .groupBy("k", "n_sup")
        .agg(count(lit(1)).as("n_li"), sum("l_quantity").as("sum_qty"))
        .orderBy("k")
    },

    // ----- sketch-driven differentiated skew join (ROADMAP 34): same
    // pathological distribution as join_skew_salted, but NOTHING is
    // hand-configured — one approx_top_k pass detects the hot keys
    // (key 0 holds ~90% of probe rows), routes them through a broadcast
    // of just their build rows, and sends the cold tail through the
    // normal shuffle join. Result is row-identical to the plain join
    // the oracle runs: the sketch only decides routing, so an estimate
    // flipping a borderline key between hot and cold cannot change the
    // output — which is also why an approximate detector is safe to
    // put in a hash-compared query at all.
    Q(
      "join_skew_auto",
      """WITH probe AS (SELECT CAST(CASE WHEN l_orderkey % 10 <> 0 THEN 0
        |                              ELSE l_orderkey % 97 END AS BIGINT) AS k,
        |                      l_quantity
        |               FROM lineitem),
        |build AS (SELECT CAST(s_suppkey % 97 AS BIGINT) AS k, count(*) AS n_sup
        |          FROM supplier GROUP BY 1)
        |SELECT p.k, b.n_sup, count(*) AS n_li, sum(l_quantity) AS sum_qty
        |FROM probe p JOIN build b ON p.k = b.k
        |GROUP BY p.k, b.n_sup ORDER BY p.k""".stripMargin,
    ) { (s, d) =>
      val probe = Tables.lineitem(s, d).select(
        expr("CAST(CASE WHEN l_orderkey % 10 != 0 THEN 0 ELSE l_orderkey % 97 END AS BIGINT)").as("k"),
        col("l_quantity"),
      )
      val build = Tables.supplier(s, d)
        .groupBy(expr("CAST(s_suppkey % 97 AS BIGINT)").as("k"))
        .agg(count(lit(1)).as("n_sup"))
      graft.operators.Skew
        .autoSkewJoin(probe, build, "k", hotShare = 0.2)
        .groupBy("k", "n_sup")
        .agg(count(lit(1)).as("n_li"), sum("l_quantity").as("sum_qty"))
        .orderBy("k")
    },

    // ----- skew-proof NON-ALGEBRAIC aggregation (ROADMAP 38): partial
    // aggregation fixes hot-key skew for sums and counts, but per-key
    // DISTINCT and collect_set still funnel a hot key's whole distinct
    // value set through one reducer. Salting by a HASH OF THE VALUE
    // (operators.Skew.saltedDistinct / saltedCollectSet) splits each
    // key's distinct values disjointly across numSalts sub-groups —
    // counts SUM exactly and sets CONCATENATE exactly (same value ⇒
    // same salt), with zero randomness — so the result hash-matches
    // the plain DISTINCT the oracle runs while the hot key's reducer
    // state shrinks numSalts-fold. Key 0 holds ~90% of rows here.
    Q(
      "agg_skew_distinct",
      """WITH probe AS (SELECT CAST(CASE WHEN l_orderkey % 10 <> 0 THEN 0
        |                              ELSE l_orderkey % 97 END AS BIGINT) AS k,
        |                      l_linenumber
        |               FROM lineitem)
        |SELECT k, count(DISTINCT l_linenumber) AS n_distinct,
        |       array_to_string(list_sort(list(DISTINCT l_linenumber)), ',') AS vals
        |FROM probe GROUP BY k ORDER BY k""".stripMargin,
    ) { (s, d) =>
      val probe = Tables.lineitem(s, d).select(
        expr("CAST(CASE WHEN l_orderkey % 10 != 0 THEN 0 ELSE l_orderkey % 97 END AS BIGINT)").as("k"),
        col("l_linenumber"),
      )
      graft.operators.Skew.saltedDistinct(probe, "k", "l_linenumber", 8)
        .join(
          graft.operators.Skew.saltedCollectSet(probe, "k", "l_linenumber", 8)
            .select(col("k"), array_join(col("values"), ",").as("vals")),
          Seq("k"),
        )
        .select("k", "n_distinct", "vals")
        .orderBy("k")
    },

    // ----- pivot (conditional cross-tab; Spark pivot API <-> portable
    // conditional aggregation in the oracle)
    Q(
      "agg_pivot",
      """SELECT l_returnflag,
        | sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END) AS qty_f,
        | sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END) AS qty_o
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum("l_quantity"))
        .na.fill(0.0, Seq("F", "O"))
        .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o"))
        .orderBy("l_returnflag")
    },

    // ----- unpivot / melt: wide measures to long form (Spark unpivot
    // API <-> portable UNION ALL oracle)
    Q(
      "unpivot_melt",
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'qty' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'price', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem)
        |ORDER BY l_orderkey, l_linenumber, measure""".stripMargin,
    ) { (s, d) =>
      // NO fanout here (r21: tried and reverted) — (l_orderkey,
      // l_linenumber) is NOT unique in the fixture, so the declared
      // ORDER BY has ties and the oracle's row-order compare depends on
      // the tie order both engines happen to produce from a sequential
      // scan; a repartition upstream of the non-total sort reorders the
      // tied rows and fails the gate. General rule recorded in
      // OPTIMIZATION_r21.md: never change partitioning upstream of a
      // non-total declared sort.
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").as("qty"), col("l_extendedprice").as("price"), col("l_discount").as("discount"),
        )
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("qty"), col("price"), col("discount")),
          "measure",
          "value",
        )
        .orderBy("l_orderkey", "l_linenumber", "measure")
    },

    // ----- list aggregation with deterministic ordering
    Q(
      "agg_listagg",
      """SELECT o_orderpriority,
        | array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
        | count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          array_join(sort_array(collect_set(col("o_orderstatus"))), ",").as("statuses"),
          count(lit(1)).as("n"),
        )
        .orderBy("o_orderpriority")
    },

    // ----- distribution windows: ntile / percent_rank / cume_dist
    // (rank-derived rationals of row counts -> bit-exact on both engines)
    Q(
      "window_ntile",
      """SELECT o_orderkey,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd
        |FROM orders WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      val w = Window.orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
        )
        .orderBy("o_orderkey")
    },

    // ----- exact percentiles (linear interpolation — identical on both
    // engines; quantity is integer-valued so interpolated values sit on
    // the .25 grid and compare bit-exact)
    Q(
      "agg_percentile",
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.25) AS q25,
        | quantile_cont(l_quantity, 0.5) AS median_qty,
        | quantile_cont(l_quantity, 0.75) AS q75,
        | min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.75)").as("q75"),
          min("l_quantity").as("min_qty"),
          max("l_quantity").as("max_qty"),
        )
        .orderBy("l_returnflag")
    },

    // ----- statistical aggregates (corr/stddev/var/skew are off-grid
    // doubles: both engines compute from the same sufficient statistics,
    // rounding only masks last-ulp merge-order differences)
    Q(
      "agg_stats",
      """SELECT l_returnflag,
        | round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
        | round(stddev_samp(l_quantity), 6) AS qty_stddev,
        | round(var_samp(l_quantity), 6) AS qty_var,
        | round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("qty_price_corr"),
          round(stddev_samp("l_quantity"), 6).as("qty_stddev"),
          round(var_samp("l_quantity"), 6).as("qty_var"),
          round(covar_samp("l_quantity", "l_extendedprice"), 4).as("qty_price_cov"),
        )
        .orderBy("l_returnflag")
    },

    // ----- RANGE window frame: trailing 30-day sum per customer (frame
    // bounds by value, not row position)
    Q(
      "window_range_frame",
      """WITH o AS (SELECT o_custkey, o_orderkey,
        |                  CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS BIGINT) AS day_no,
        |                  CAST(o_totalprice AS DECIMAL(12,2)) AS price
        |           FROM orders)
        |SELECT o_custkey, o_orderkey,
        |       CAST(sum(price) OVER (PARTITION BY o_custkey ORDER BY day_no
        |                             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_30d
        |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, Window.currentRow)
      Tables.orders(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).cast("long").as("day_no"),
          col("o_totalprice").cast("decimal(12,2)").as("price"),
        )
        .withColumn("trailing_30d", sum("price").over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "trailing_30d")
        .orderBy("o_custkey", "o_orderkey")
    },

    // ----- navigation window functions: first/last/nth in frame
    Q(
      "window_navigation",
      """SELECT o_custkey, o_orderkey,
        | first_value(o_orderkey) OVER w AS first_order,
        | last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        | nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order,
        | lead(o_orderkey) OVER w AS next_order
        |FROM orders WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          first("o_orderkey").over(w).as("first_order"),
          last("o_orderkey").over(wFull).as("last_order"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"),
          lead("o_orderkey", 1).over(w).as("next_order"),
        )
        .orderBy("o_custkey", "o_orderkey")
    },

    // ----- conditional / comparison scalar family
    Q(
      "cond_funcs",
      """SELECT p_partkey,
        | CASE WHEN p_size < 10 THEN 'small' WHEN p_size < 30 THEN 'mid' ELSE 'big' END AS size_class,
        | CAST(greatest(p_size, 25) AS INTEGER) AS g25,
        | CAST(least(p_size, 25) AS INTEGER) AS l25,
        | nullif(p_size, 25) AS nn,
        | coalesce(nullif(p_size, 25), -1) AS nn_filled,
        | CASE WHEN p_size % 2 = 0 THEN p_size ELSE -p_size END AS signed_size
        |FROM part ORDER BY p_partkey""".stripMargin,
    ) { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          when(col("p_size") < 10, "small").when(col("p_size") < 30, "mid").otherwise("big").as("size_class"),
          greatest(col("p_size"), lit(25)).as("g25"),
          least(col("p_size"), lit(25)).as("l25"),
          nullif(col("p_size"), lit(25)).as("nn"),
          coalesce(nullif(col("p_size"), lit(25)), lit(-1)).as("nn_filled"),
          when(pmod(col("p_size"), lit(2)) === 0, col("p_size")).otherwise(-col("p_size")).as("signed_size"),
        )
        .orderBy("p_partkey")
    },

    // ----- ranking window: top-3 orders per customer
    Q(
      "window_rank",
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select("o_custkey", "rn", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "rn")
    },

    // ----- analytic window: running frame sum + lag
    Q(
      "window_lag_frame",
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
        |       lag(o_totalprice) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, d)
        .withColumn(
          "running_total",
          sum(col("o_totalprice").cast("decimal(12,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"),
        )
        .withColumn("prev_price", lag("o_totalprice", 1).over(w))
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_total", "prev_price")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },

    // ----- global sort + limit (TakeOrderedAndProject top-k)
    Q(
      "sort_limit_topk",
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(100)
    },

    // ----- union all (bag union)
    Q(
      "union_all",
      """SELECT * FROM (
        |  SELECT 'urgent' AS src, o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'
        |  UNION ALL
        |  SELECT 'big' AS src, o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 450000)
        |ORDER BY src, o_orderkey""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      val a = o.where(col("o_orderpriority") === "1-URGENT")
        .select(lit("urgent").as("src"), col("o_orderkey"), col("o_totalprice"))
      val b = o.where(col("o_totalprice") > 450000)
        .select(lit("big").as("src"), col("o_orderkey"), col("o_totalprice"))
      a.union(b).orderBy("src", "o_orderkey")
    },

    // ----- intersect (distinct set semantics, both engines)
    Q(
      "intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .intersect(o.where(col("o_orderstatus") === "O").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ----- except (distinct set semantics, both engines)
    Q(
      "except_",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_totalprice > 300000
        |ORDER BY c_custkey""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d).select("c_custkey")
        .except(
          Tables.orders(s, d).where(col("o_totalprice") > 300000)
            .select(col("o_custkey").as("c_custkey")),
        )
        .orderBy("c_custkey")
    },

    // ----- multiset (bag) set ops: INTERSECT ALL / EXCEPT ALL keep
    // duplicate multiplicities — min(m,n) copies / m-n copies — which
    // distinct-set intersect/except destroy. The multiset forms are
    // what dedup-accounting pipelines need ("how many copies survive
    // in both snapshots"), and Spark implements them as a single
    // aggregate-free shuffle (no global distinct).
    Q(
      "intersect_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY o_custkey""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .intersectAll(o.where(col("o_totalprice") > 100000).select("o_custkey"))
        .orderBy("o_custkey")
    },
    Q(
      "except_all",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        |ORDER BY o_custkey""".stripMargin,
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      o.where(col("o_orderstatus") === "F").select("o_custkey")
        .exceptAll(o.where(col("o_totalprice") > 100000).select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ----- exact row dedup (dropDuplicates ↔ SELECT DISTINCT)
    Q(
      "dedup_exact",
      """SELECT DISTINCT l_returnflag, l_linestatus,
        |       CAST(year(l_shipdate) AS INTEGER) AS ship_year
        |FROM lineitem ORDER BY l_returnflag, l_linestatus, ship_year""".stripMargin,
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"), year(col("l_shipdate")).as("ship_year"))
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus", "ship_year")
    },

    // ----- string function family (mirrors the reference's path parsing,
    // SURVEY.md §2.1 O5/O8 — split/regexp_extract/concat on key-like strings)
    Q(
      "string_funcs",
      """SELECT p_partkey,
        | upper(p_brand) AS brand_u,
        | split_part(p_brand, '#', 2) AS brand_num,
        | CAST(length(p_name) AS INTEGER) AS name_len,
        | concat_ws('/', p_type, p_brand) AS tagged,
        | regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        | substr(p_name, 1, 3) AS pfx,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_pad
        |FROM part ORDER BY p_partkey""".stripMargin,
    ) { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          split_part(col("p_brand"), lit("#"), lit(2)).as("brand_num"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_type"), col("p_brand")).as("tagged"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          substring(col("p_name"), 1, 3).as("pfx"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("key_pad"),
        )
        .orderBy("p_partkey")
    },

    // ----- date/time function family (mirrors O4/O6 freshness & partition math)
    Q(
      "date_funcs",
      """SELECT o_orderkey,
        | CAST(year(o_orderdate) AS INTEGER) AS y,
        | CAST(month(o_orderdate) AS INTEGER) AS m,
        | CAST(day(o_orderdate) AS INTEGER) AS dom,
        | CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
        | date_trunc('month', o_orderdate) AS month_start,
        | CAST(o_orderdate AS DATE) + 30 AS due_date,
        | CAST(CAST(o_orderdate AS DATE) - DATE '1995-01-01' AS INTEGER) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("qtr"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(to_date(col("o_orderdate")), 30).as("due_date"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date")).as("days_since"),
        )
        .orderBy("o_orderkey")
    },

    // ----- string family II: regex replace, translate, trims, repetition
    Q(
      "string_funcs2",
      """SELECT p_partkey,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS devoweled,
        | translate(p_brand, '#', '-') AS brand_t,
        | reverse(p_name) AS rev_name,
        | repeat(substr(p_name, 1, 2), 2) AS rep2,
        | ltrim(p_name, 'abcdef') AS ltrimmed,
        | CAST(position('a' IN p_name) AS INTEGER) AS first_a
        |FROM part ORDER BY p_partkey""".stripMargin,
    ) { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("devoweled"),
          translate(col("p_brand"), "#", "-").as("brand_t"),
          reverse(col("p_name")).as("rev_name"),
          repeat(substring(col("p_name"), 1, 2), 2).as("rep2"),
          ltrim(col("p_name"), "abcdef").as("ltrimmed"),
          instr(col("p_name"), "a").as("first_a"),
        )
        .orderBy("p_partkey")
    },

    // ----- array family II: dedup/sort/search/flatten over word arrays
    Q(
      "array_funcs2",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
        |SELECT doc_id,
        | CAST(len(list_distinct(w)) AS INTEGER) AS n_vocab,
        | list_sort(list_distinct(w))[1] AS first_vocab,
        | list_contains(w, 'the') AS has_the,
        | CAST(list_position(w, 'the') AS INTEGER) AS pos_the,
        | CAST(len(flatten([w, w])) AS INTEGER) AS n_doubled
        |FROM t ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(
          col("doc_id"),
          size(array_distinct(col("w"))).as("n_vocab"),
          element_at(sort_array(array_distinct(col("w"))), 1).as("first_vocab"),
          array_contains(col("w"), "the").as("has_the"),
          array_position(col("w"), "the").cast("int").as("pos_the"),
          size(flatten(array(col("w"), col("w")))).as("n_doubled"),
        )
        .orderBy("doc_id")
    },

    // ----- date family II: calendar arithmetic with month-end clamping
    Q(
      "date_funcs2",
      """SELECT o_orderkey,
        | CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS next_month,
        | last_day(CAST(o_orderdate AS DATE)) AS eom,
        | CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INTEGER) AS dow0,
        | CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          add_months(to_date(col("o_orderdate")), 1).as("next_month"),
          last_day(to_date(col("o_orderdate"))).as("eom"),
          // Spark: Sunday=1; DuckDB: Sunday=0 — align to DuckDB's zero base
          (dayofweek(to_date(col("o_orderdate"))) - 1).as("dow0"),
          weekofyear(to_date(col("o_orderdate"))).as("iso_week"),
        )
        .orderBy("o_orderkey")
    },

    // ----- error-tolerant scalar family: try_cast / null-on-zero division
    Q(
      "try_funcs",
      """SELECT o_orderkey,
        | TRY_CAST(o_orderpriority AS INTEGER) AS pri_int,
        | TRY_CAST(split_part(o_orderpriority, '-', 1) AS INTEGER) AS pri_num,
        | o_totalprice / nullif(o_custkey % 3, 0) AS risky_div
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      // try_to_int is the native non-throwing parse with pinned try_cast
      // parity (TryToIntSpec): on this column — where most rows DON'T
      // parse — the built-in TRY cast pays a caught exception per
      // failing row, the dominant cost of this whole query.
      graft.functions.GraftFunctions.register(s)
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          expr("try_to_int(o_orderpriority)").as("pri_int"),
          expr("try_to_int(split_part(o_orderpriority, '-', 1))").as("pri_num"),
          expr("try_divide(o_totalprice, o_custkey % 3)").as("risky_div"),
        )
        .orderBy("o_orderkey")
    },

    // ----- math function family
    Q(
      "math_funcs",
      """SELECT p_partkey,
        | round(sqrt(p_retailprice), 4) AS sqrt_price,
        | round(ln(p_retailprice), 4) AS ln_price,
        | pow(CAST(p_size AS DOUBLE), 2) AS size_sq,
        | abs(p_size - 25) AS size_dev,
        | CAST(ceil(p_retailprice) AS BIGINT) AS ceil_price,
        | CAST(floor(p_retailprice) AS BIGINT) AS floor_price,
        | p_partkey % 7 AS key_mod
        |FROM part ORDER BY p_partkey""".stripMargin,
    ) { (s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          round(sqrt(col("p_retailprice")), 4).as("sqrt_price"),
          round(log(col("p_retailprice")), 4).as("ln_price"),
          pow(col("p_size").cast("double"), 2.0).as("size_sq"),
          abs(col("p_size") - lit(25)).as("size_dev"),
          ceil(col("p_retailprice")).as("ceil_price"),
          floor(col("p_retailprice")).as("floor_price"),
          pmod(col("p_partkey"), lit(7L)).as("key_mod"),
        )
        .orderBy("p_partkey")
    },

    // ----- array / higher-order function family over embedding vectors.
    // Folds are sequential in both engines (Spark `aggregate` starts at 0.0,
    // DuckDB `list_reduce` starts at the first element — identical double
    // sequences), so values are bit-exact before the safety rounding.
    Q(
      "array_funcs",
      """SELECT vec_id, label,
        | CAST(len(embedding) AS INTEGER) AS dim,
        | round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                   (a, x) -> a + x), 6) AS vec_sum,
        | round(sqrt(list_reduce(list_transform(embedding,
        |                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |                   (a, x) -> a + x)), 6) AS vec_norm,
        | round(CAST(list_max(embedding) AS DOUBLE), 6) AS vec_max,
        | CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    ) { (s, d) =>
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          col("label"),
          size(col("embedding")).as("dim"),
          round(expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE)), 0.0D, (a, x) -> a + x)"), 6).as("vec_sum"),
          round(expr("sqrt(aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0.0D, (a, x) -> a + x))"), 6).as("vec_norm"),
          round(expr("CAST(array_max(embedding) AS DOUBLE)"), 6).as("vec_max"),
          expr("size(filter(embedding, x -> x > 0))").as("n_pos"),
        )
        .orderBy("vec_id")
    },

    // ----- generator with ordinality: posexplode flattens each vector to
    // (position, value) rows — the UDTF/lateral-view shape. Spark's pos
    // is 0-based, DuckDB's generate_subscripts 1-based; both sides emit
    // the 1-based position. float→double cast is exact, so round(…,6)
    // sees identical doubles in both engines.
    Q(
      "array_posexplode",
      """SELECT vec_id, CAST(i AS INTEGER) AS pos,
        |       round(CAST(x AS DOUBLE), 6) AS x
        |FROM (SELECT vec_id, unnest(embedding) AS x,
        |             generate_subscripts(embedding, 1) AS i
        |      FROM embeddings)
        |WHERE vec_id < 50 ORDER BY vec_id, pos""".stripMargin,
    ) { (s, d) =>
      Tables.embeddings(s, d)
        .where(col("vec_id") < 50)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .select(
          col("vec_id"),
          (col("pos") + 1).cast("int").as("pos"),
          round(col("x").cast("double"), 6).as("x"),
        )
        .orderBy("vec_id", "pos")
    },

    // ----- file-metadata plane as a query surface: the hidden _metadata
    // struct exposes (file_path, file_size, file_modification_time) on
    // any file-source read — the same triple the reference builds its
    // whole plan on (parquet_compactor.py:101-122). DuckDB has no
    // equivalent column → rows-only check.
    Q.noOracle("meta_file_source") { (s, d) =>
      Tables.lineitem(s, d)
        .select(col("_metadata.file_name").as("file_name"), col("_metadata.file_size").as("file_size"))
        .groupBy("file_name", "file_size")
        .agg(count(lit(1)).as("n_rows"))
        .orderBy("file_name")
    },

    // ----- custom DataSource V2 connector: the recursive listing as a
    // relational table (graft.sources.FileMetaSource). DuckDB's glob()
    // exposes names but not sizes/mtimes -> rows-only check.
    Q.noOracle("meta_listing_source") { (s, d) =>
      s.read
        .format("graft.sources.FileMetaSource")
        .load(d)
        .where(col("path").endsWith(".parquet"))
        .select(
          substring_index(col("path"), "/", -1).as("file_name"),
          col("size"),
        )
        .orderBy("file_name")
    },

    // ----- full outer join: both sides contribute unmatched rows (the
    // left side is a filtered customer subset, the right an aggregate of
    // big orders, so NULLs appear on both sides of the seam)
    Q(
      "join_full_outer",
      """WITH rich AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 7500),
        |big AS (SELECT o_custkey, count(*) AS n_big,
        |               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS big_total
        |        FROM orders WHERE o_totalprice > 350000 GROUP BY o_custkey)
        |SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name,
        |       coalesce(n_big, 0) AS n_big, coalesce(big_total, 0) AS big_total
        |FROM rich FULL OUTER JOIN big ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    ) { (s, d) =>
      val rich = Tables.customer(s, d)
        .where(col("c_acctbal") > 7500)
        .select("c_custkey", "c_name")
      val big = Tables.orders(s, d)
        .where(col("o_totalprice") > 350000)
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_big"), moneySum("o_totalprice").as("big_total"))
      rich.join(big, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"),
          coalesce(col("n_big"), lit(0L)).as("n_big"),
          coalesce(col("big_total"), lit(0.0)).as("big_total"),
        )
        .orderBy("custkey")
    },

    // ----- correlated scalar subquery: each order compared against its
    // own customer's exact-decimal average (Catalyst decorrelates this
    // into an aggregate + join — no per-row re-execution)
    Q(
      "correlated_subquery",
      """SELECT o_orderkey, o_custkey
        |FROM orders o
        |WHERE o_totalprice > 1.8 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
        |                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      Q.withTempViews(s)("orders_corr" -> Tables.orders(s, d)) {
        s.sql(
          """SELECT o_orderkey, o_custkey
            |FROM orders_corr o
            |WHERE o_totalprice > 1.8 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
            |                            FROM orders_corr o2 WHERE o2.o_custkey = o.o_custkey)
            |ORDER BY o_orderkey""".stripMargin,
        )
      }
    },

    // ----- lateral join: a correlated subquery in FROM position — for
    // each nation, its 2 highest-balance customers. Same result as a
    // window rank, but a distinct operator surface (Catalyst
    // decorrelates LATERAL ... LIMIT into a DomainJoin + per-key
    // top-k); the unique c_custkey tiebreaker keeps both engines
    // deterministic.
    Q(
      "join_lateral_topn",
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,
    ) { (s, d) =>
      Q.withTempViews(s)("nation_lat" -> Tables.nation(s, d), "customer_lat" -> Tables.customer(s, d)) {
        s.sql(
          """SELECT n.n_name, t.c_custkey, t.c_acctbal
            |FROM nation_lat n,
            |LATERAL (SELECT c_custkey, c_acctbal FROM customer_lat c
            |         WHERE c.c_nationkey = n.n_nationkey
            |         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
            |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,
        )
      }
    },

    // ----- native recursive CTE (Spark 4 WITH RECURSIVE): every doc
    // walks its binary-tree ancestor chain (parent = id div 2) to the
    // root — ~log2(max id) iterative union steps, each a full Spark
    // job over the frontier. Demonstrates the SQL recursion surface
    // end-to-end against DuckDB's recursion; for data-sized graphs the
    // scale path remains operators.ConnectedComponents' bounded-plan
    // label propagation (a recursive CTE's unioned lineage grows with
    // depth — fine at log depth, wrong at graph-diameter depth).
    Q(
      "recursive_cte_ancestors",
      """WITH RECURSIVE anc AS (
        |  SELECT doc_id, doc_id AS node, 0 AS depth FROM documents
        |  UNION ALL
        |  SELECT doc_id, node // 2, depth + 1 FROM anc WHERE node > 1)
        |SELECT doc_id, CAST(max(depth) AS INTEGER) AS depth_to_root
        |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      Q.withTempViews(s)("docs_rec" -> Tables.documents(s, d)) {
        s.sql(
          """WITH RECURSIVE anc AS (
            |  SELECT doc_id, doc_id AS node, 0 AS depth FROM docs_rec
            |  UNION ALL
            |  SELECT doc_id, node div 2, depth + 1 FROM anc WHERE node > 1)
            |SELECT doc_id, CAST(max(depth) AS INT) AS depth_to_root
            |FROM anc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
        )
      }
    },

    // ----- distribution-rank window family: percent_rank / cume_dist /
    // ndv-free relative position. Orderings carry the unique o_orderkey
    // tiebreaker so rank ties (duplicate prices) resolve identically in
    // both engines and the ratio doubles are bit-identical (same integer
    // operands, one IEEE division each).
    Q(
      "window_cume_dist",
      """SELECT o_orderkey, o_orderstatus,
        | percent_rank() OVER w AS pr,
        | cume_dist() OVER w AS cd,
        | CAST(ntile(10) OVER w AS INTEGER) AS decile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderstatus"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(10).over(w).as("decile"),
        )
        .orderBy("o_orderkey")
    },

    // ----- argmax/argmin aggregation via max_by/min_by (single-pass,
    // map-side combinable — the Planner's newest-file rule at scale).
    // The by-key is the unique o_orderkey so ties are impossible.
    Q(
      "agg_max_by",
      """SELECT o_orderstatus,
        | max_by(o_orderdate, o_orderkey) AS latest_keyed_date,
        | min_by(o_orderdate, o_orderkey) AS first_keyed_date,
        | max(o_orderkey) AS max_key, count(*) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          max_by(col("o_orderdate"), col("o_orderkey")).as("latest_keyed_date"),
          min_by(col("o_orderdate"), col("o_orderkey")).as("first_keyed_date"),
          max("o_orderkey").as("max_key"),
          count(lit(1)).as("n"),
        )
        .orderBy("o_orderstatus")
    },

    // ----- mode (most frequent value) per group, with a DETERMINISTIC
    // tiebreak. Both engines' built-in mode() picks an arbitrary value
    // among tied counts — unusable under hash comparison — so the mode
    // is derived explicitly: count per (group, value), rank by
    // (count DESC, value ASC), keep rank 1. Two hash aggs + one small
    // window over the distinct-value table (rows = distinct values, not
    // input rows) — the scalable shape at any corpus size.
    Q(
      "agg_mode",
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
        |           FROM lineitem GROUP BY l_returnflag, l_quantity),
        |r AS (SELECT l_returnflag, l_quantity, cnt,
        |             row_number() OVER (PARTITION BY l_returnflag
        |                                ORDER BY cnt DESC, l_quantity ASC) AS rk
        |      FROM c)
        |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_count
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin,
    ) { (s, d) =>
      val c = Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag").orderBy(col("cnt").desc, col("l_quantity").asc)
      c.withColumn("rk", row_number().over(w))
        .where(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("cnt").as("mode_count"))
        .orderBy("l_returnflag")
    },

    // ----- JSON extraction from string payloads
    Q(
      "json_funcs",
      """SELECT event_id,
        | CAST(props->>'$.k' AS INTEGER) AS k,
        | CAST(props->>'$.k' AS INTEGER) % 10 AS k_mod
        |FROM events WHERE event_type = 'click' ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .where(col("event_type") === "click")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"),
        )
        .orderBy("event_id")
    },
  )
}
