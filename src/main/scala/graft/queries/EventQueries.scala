package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Event-time batch windowing over the `events` table.
  *
  * `ts` arrives as parquet TIMESTAMP(NANOS); Tables.events truncates to
  * micros exactly like DuckDB's ns→us coercion, so timestamps compare
  * bit-for-bit (pinned by `max_ts` in the tumbling query).
  */
object EventQueries {

  /** The exact-mode guard for `agg_theta_set_ops`: a QuickSelect theta
    * sketch at lgK=16 answers exactly to at least k = 2¹⁶ retained
    * hashes; the query's oracle identity (estimate == exact) is only
    * valid in that regime, so its plan asserts every filtered user set
    * is below the canonical 15/16·k rebuild fraction — failing with a
    * NAMED error at a too-big SF instead of a bare oracle hash
    * mismatch (r19 prescription 3).
    */
  private[queries] val thetaExactGuard: Long = 61440L // 15/16 * 2^16

  val qs: Seq[Q] = Seq(

    // ----- rolling z-score anomaly detection: each event scored
    // against its OWN user's trailing 20-event window (frame ends at
    // 1 PRECEDING so the scored value never contaminates its baseline).
    // Float discipline: value quantizes to integer cents via floor
    // (never round — grid ties), so the frame's sum/sum-of-squares are
    // EXACT integers in both engines and z derives through one fixed
    // double expression — bit-stable cross-engine with no aggregate
    // reassociation anywhere. One shuffle (the per-user window);
    // embarrassingly parallel across users at 100 TB.
    Q(
      "event_anomaly_zscore",
      """WITH e AS (SELECT event_id, user_id, ts,
        |                  CAST(floor(value * 100) AS BIGINT) AS v FROM events),
        |w AS (SELECT event_id, user_id, v,
        |             count(v) OVER win AS cnt,
        |             sum(v) OVER win AS s,
        |             sum(v * v) OVER win AS s2
        |      FROM e
        |      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_id, user_id,
        |             (v - CAST(s AS DOUBLE) / cnt) /
        |             sqrt((s2 - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1)) AS z
        |      FROM w
        |      WHERE cnt >= 8 AND (s2 - CAST(s AS DOUBLE) * s / cnt) > 0)
        |SELECT event_id, user_id, round(z, 6) AS z
        |FROM z WHERE abs(z) > 2.5 ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      val win = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-20, -1)
      val varNum = col("s2") - col("s").cast("double") * col("s") / col("cnt")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"),
          floor(col("value") * 100).cast("bigint").as("v"))
        .select(col("event_id"), col("user_id"), col("v"),
          count("v").over(win).as("cnt"),
          sum("v").over(win).as("s"),
          sum(col("v") * col("v")).over(win).as("s2"))
        .where(col("cnt") >= 8 && varNum > 0)
        .withColumn("z",
          (col("v") - col("s").cast("double") / col("cnt")) /
            sqrt(varNum / (col("cnt") - 1)))
        .where(abs(col("z")) > 2.5)
        .select(col("event_id"), col("user_id"), round(col("z"), 6).as("z"))
        .orderBy("event_id")
    },

    // ----- tumbling event-time window (Spark `window()` ↔ date_trunc)
    Q(
      "event_tumbling_window",
      """SELECT date_trunc('hour', ts) AS bucket, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value, max(ts) AS max_ts
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"),
          max("ts").as("max_ts"),
        )
        .select(col("window.start").as("bucket"), col("n_events"), col("total_value"), col("max_ts"))
        .orderBy("bucket")
    },

    // ----- hopping (sliding) event-time window: 1-hour windows every 30
    // minutes, so each event lands in exactly two windows. Spark's
    // `window(ts, size, slide)` generates both assignments natively; the
    // oracle replays the same epoch-aligned arithmetic (a window start s
    // contains ts iff s ≡ 0 mod 30min and s ∈ {bucket30(ts), bucket30(ts)
    // − 30min}) via an explicit 2-row cross join.
    Q(
      "event_hopping_window",
      """WITH e AS (SELECT epoch_us(ts) // 1800000000 AS b, value FROM events),
        |w AS (SELECT make_timestamp((b - k) * 1800000000) AS w_start, value
        |      FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k) ks)
        |SELECT w_start, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM w GROUP BY w_start ORDER BY w_start""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(12,2)")).cast("double").as("total_value"),
        )
        .select(col("window.start").as("w_start"), col("n_events"), col("total_value"))
        .orderBy("w_start")
    },

    // ----- time-series resample + gap fill: the hourly series per event
    // type is re-gridded onto a dense hour spine (sequence/generate_series
    // from the observed bounds × the type dimension — a 1-row broadcast
    // crossJoin, not data-sized), missing hours get n_events=0, and the
    // value channel is interpolated by last-observation-carried-forward
    // (window `last(_, ignoreNulls)` over an unbounded-preceding frame,
    // partitioned by type so the fill parallelizes per series). max() is
    // the carried statistic — order-insensitive, so bit-exact across
    // engines where a float sum would not be.
    Q(
      "event_resample_locf",
      """WITH ev AS (SELECT date_trunc('hour', ts) AS h, event_type, value FROM events),
        |agg AS (SELECT h, event_type, count(*) AS n, max(value) AS vmax
        |        FROM ev GROUP BY h, event_type),
        |bounds AS (SELECT min(h) AS h0, max(h) AS h1 FROM ev),
        |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
        |grid AS (SELECT s.h, t.event_type
        |         FROM spine s CROSS JOIN (SELECT DISTINCT event_type FROM ev) t),
        |j AS (SELECT g.h, g.event_type, coalesce(a.n, 0) AS n_events, a.vmax
        |      FROM grid g LEFT JOIN agg a ON a.h = g.h AND a.event_type = g.event_type)
        |SELECT h, event_type, CAST(n_events AS BIGINT) AS n_events,
        |       last_value(vmax IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
        |FROM j ORDER BY event_type, h""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(date_trunc("hour", col("ts")).as("h"), col("event_type"), col("value"))
      // ONE scan of events: bounds, the type dimension, and the final
      // left join all derive from the (hours x types)-sized agg, whose
      // groupBy exchange is identical under each consumer — exchange
      // reuse scans the base table once and only the cheap post-shuffle
      // aggregation re-runs per consumer, with nothing left cached
      val agg = ev.groupBy("h", "event_type")
        .agg(count(lit(1)).as("n"), max("value").as("vmax"))
      val spine = agg.agg(min("h").as("h0"), max("h").as("h1"))
        .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      val grid = spine.crossJoin(broadcast(agg.select("event_type").distinct()))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(agg, Seq("h", "event_type"), "left")
        .select(
          col("h"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          col("vmax"),
        )
        .withColumn("locf_value", last("vmax", ignoreNulls = true).over(w))
        .select("h", "event_type", "n_events", "locf_value")
        .orderBy("event_type", "h")
    },

    // ----- funnel analysis: users whose first signup precedes their
    // first click precedes their first purchase (conditional min-by-type
    // aggregation — one pass, one shuffle)
    Q(
      "event_funnel",
      """SELECT user_id,
        | min(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
        | min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
        | min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
        |FROM events GROUP BY user_id
        |HAVING first_signup IS NOT NULL AND first_click IS NOT NULL AND first_purchase IS NOT NULL
        |   AND first_signup < first_click AND first_click < first_purchase
        |ORDER BY user_id""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy("user_id")
        .agg(
          min(when(col("event_type") === "signup", col("ts"))).as("first_signup"),
          min(when(col("event_type") === "click", col("ts"))).as("first_click"),
          min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase"),
        )
        .where(
          col("first_signup").isNotNull && col("first_click").isNotNull && col("first_purchase").isNotNull &&
            col("first_signup") < col("first_click") && col("first_click") < col("first_purchase"),
        )
        .orderBy("user_id")
    },

    // ----- as-of join: each click matched to the latest view at-or-before
    // its event time, per user. Composed from existing ops (SURVEY.md
    // §7.5(a)): non-equi join + deterministic argmax window — DuckDB's
    // ASOF JOIN leaves ties unspecified, so both sides use the same
    // explicit (view_ts, view_id) DESC tiebreak.
    Q(
      "join_asof",
      """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts FROM events WHERE event_type = 'click'),
        |v AS (SELECT event_id AS view_id, user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
        |j AS (SELECT c.click_id, c.user_id, c.click_ts, v.view_id, v.view_ts,
        |             row_number() OVER (PARTITION BY c.click_id
        |                                ORDER BY v.view_ts DESC, v.view_id DESC) AS rn
        |      FROM c LEFT JOIN v ON c.user_id = v.user_id AND v.view_ts <= c.click_ts)
        |SELECT click_id, user_id, click_ts, view_id, view_ts
        |FROM j WHERE rn = 1 ORDER BY click_id""".stripMargin,
    ) { (s, d) =>
      val e = Tables.events(s, d)
      val c = e.where(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      val v = e.where(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      val w = Window.partitionBy("click_id").orderBy(col("view_ts").desc, col("view_id").desc)
      c.join(v, col("user_id") === col("v_user_id") && col("view_ts") <= col("click_ts"), "left")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("click_id", "user_id", "click_ts", "view_id", "view_ts")
        .orderBy("click_id")
    },

    // ----- sessionization (gap > 30 min starts a new session), batch form:
    // lag window to flag session starts, then count sessions per user.
    Q(
      "event_session_like",
      """WITH flagged AS (
        |  SELECT user_id,
        |         CASE WHEN lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                   > 1800000000
        |              THEN 1 ELSE 0 END AS is_new
        |  FROM events)
        |SELECT user_id, CAST(sum(is_new) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM flagged GROUP BY user_id ORDER BY user_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn(
          "is_new",
          when(col("prev_us").isNull || (unix_micros(col("ts")) - col("prev_us")) > 1800L * 1000000L, 1)
            .otherwise(0),
        )
        .groupBy("user_id")
        .agg(sum("is_new").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    },

    // ----- incremental aggregate maintenance (materialized-view
    // refresh): an existing per-type aggregate ("old" partition) merges
    // with the delta's partial aggregate instead of rescanning history —
    // count merges by sum, sum by sum, max by max, all in exact DECIMAL
    // so merged == direct bit-for-bit. The ORACLE computes the direct
    // full aggregate, so a hash match PROVES the merge path equals a
    // from-scratch rebuild. At 100 TB this is the difference between
    // re-aggregating a day and re-aggregating a decade; the parity
    // split stands in for the old-snapshot/new-files boundary.
    Q(
      "event_incremental_agg",
      """SELECT event_type, count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
        |       max(ts) AS max_ts
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val events = Tables.events(s, d)
      def partial(half: org.apache.spark.sql.DataFrame) =
        half.groupBy("event_type")
          .agg(
            count(lit(1)).as("pn"),
            sum(col("value").cast("decimal(12,2)")).as("pv"),
            max("ts").as("pm"),
          )
      val old = partial(events.where(col("event_id") % 2 === 0))
      val delta = partial(events.where(col("event_id") % 2 === 1))
      old.unionAll(delta)
        .groupBy("event_type")
        .agg(
          sum("pn").as("n_events"),
          sum("pv").cast("double").as("total_value"),
          max("pm").as("max_ts"),
        )
        .orderBy("event_type")
    },

    // ----- cohort retention, the classic product-analytics rollup: users
    // grouped by first-seen week, counted at each later week offset.
    // All-integer week arithmetic (epoch-day div 7) so both engines
    // agree exactly — no timezone/week-start semantics in play. Scale
    // shape: two user-keyed shuffles (cohort agg + join, co-partitioned
    // so the exchange is reusable) then one small (cohort, offset) agg.
    Q(
      "event_retention_cohort",
      """WITH weeks AS (SELECT user_id,
        |         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS BIGINT) AS week
        |       FROM events),
        |cohorts AS (SELECT user_id, min(week) AS cohort_week FROM weeks GROUP BY user_id)
        |SELECT c.cohort_week, w.week - c.cohort_week AS week_offset,
        |       count(DISTINCT w.user_id) AS n_users
        |FROM weeks w JOIN cohorts c ON w.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    ) { (s, d) =>
      val weeks = Tables.events(s, d)
        .select(col("user_id"), expr("unix_date(to_date(ts)) div 7").cast("long").as("week"))
      val cohorts = weeks.groupBy("user_id").agg(min("week").as("cohort_week"))
      weeks.join(cohorts, "user_id")
        .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
        .agg(countDistinct("user_id").as("n_users"))
        .orderBy("cohort_week", "week_offset")
    },

    // ----- semi-structured VARIANT path (Spark 4): parse the JSON props
    // column ONCE into the binary variant encoding, then extract typed
    // fields with variant_get — at 100 TB the variant form beats
    // re-parsing the JSON string per extraction, and parquet shredding
    // can push typed subcolumns to the scan. The oracle compares the
    // extracted VALUES (DuckDB reads the same JSON with its own
    // functions), so the encoding is free to differ.
    Q(
      "json_variant_agg",
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
        |       count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS n_high
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val k = expr("variant_get(parse_json(props), '$.k', 'bigint')")
      Tables.events(s, d)
        .select(col("event_type"), k.as("k"))
        .groupBy("event_type")
        .agg(
          sum("k").cast("bigint").as("sum_k"),
          max("k").as("max_k"),
          count_if(col("k") > 50).as("n_high"),
        )
        .orderBy("event_type")
    },

    // ----- re-aggregatable heavy hitters: approx_top_k in its
    // accumulate / combine / estimate split — per-shard sketch states
    // (the shape of a per-partition or per-day sketch table) merged
    // into a global top-k WITHOUT touching raw events again. At the
    // fixture's cardinality (5 event types << maxItemsTracked=64) the
    // counts are exact, which SketchWitnessSpec pins against a plain
    // groupBy; at real cardinality the same plan degrades gracefully
    // to an estimate. Rows-only check (sketch internals are
    // engine-specific).
    Q.noOracle("agg_heavy_hitters") { (s, d) =>
      Q.withTempViews(s)("events_hh" -> Tables.events(s, d)) {
        s.sql(
          """SELECT item, CAST(count AS BIGINT) AS est_count
            |FROM (SELECT inline(approx_top_k_estimate(approx_top_k_combine(sk, 64), 3))
            |      FROM (SELECT approx_top_k_accumulate(event_type, 64) AS sk
            |            FROM events_hh GROUP BY user_id % 4)) t(item, count)
            |ORDER BY est_count DESC, item""".stripMargin,
        )
      }
    },

    // ----- count-min sketch: the mergeable POINT-FREQUENCY sketch that
    // completes the sketch family (HLL = distinct, theta = set ops,
    // approx_top_k = heavy hitters, bloom = membership, CMS = per-key
    // counts): "how often did user X appear" from fixed-size shard
    // sketches, never from raw events. Per event_type one
    // count_min_sketch aggregate (the per-shard sketch-table shape);
    // the merge is driver-side CountMinSketch.mergeInPlace over the
    // 5-row sketch table — the 100-TB pattern merges 365 daily sketch
    // rows, not 10^12 events (Spark has no SQL-level CMS union, so the
    // tiny-table driver fold IS the honest shape; contrast
    // agg_hll_sketch_merge where hll_union_agg keeps it in-plan).
    // Estimates are seed-deterministic but implementation-specific →
    // rows-only check; the exact count rides along in-row and
    // SketchWitnessSpec pins the one-sided CMS error bound
    // (exact ≤ est ≤ exact + eps·N) over EVERY user.
    Q.noOracle("agg_count_min") { (s, d) =>
      import s.implicits._
      val events = Tables.events(s, d)
      val shardSketches = events.groupBy("event_type")
        .agg(expr("count_min_sketch(user_id, 0.001d, 0.99d, 42)").as("sk"))
        .select("sk").as[Array[Byte]].collect()
      val merged = shardSketches
        .map(b => org.apache.spark.util.sketch.CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
        .reduce { (x, y) => x.mergeInPlace(y); x }
      val mergedB = s.sparkContext.broadcast(merged.toByteArray)
      events.groupBy("user_id").agg(count(lit(1)).as("exact_n"))
        .orderBy(desc("exact_n"), col("user_id")).limit(5)
        .as[(Long, Long)]
        .map { case (u, exact) =>
          val sk = org.apache.spark.util.sketch.CountMinSketch
            .readFrom(new java.io.ByteArrayInputStream(mergedB.value))
          (u, exact, sk.estimateCount(u))
        }
        .toDF("user_id", "exact_n", "cms_est")
        .orderBy(desc("exact_n"), col("user_id"))
    },

    // ----- theta sketches: the distinct-count sketch that supports SET
    // OPERATIONS (HLL unions only; theta intersects and differences).
    // "High-value purchasers who also reported errors" without ever
    // joining the two user sets — each side is one sketch, the overlap
    // is sketch algebra. FULLY ORACLED (review r18): with lgK=16 the
    // sketches stay in exact mode to 2^16 distinct items — far past
    // every fixture SF's ~10²–10³ filtered users — so every estimate
    // EQUALS its exact count deterministically and DuckDB mirrors the
    // whole row with plain INTERSECT/EXCEPT; SketchWitnessSpec pins
    // the same equality in-row as defense at any SF.
    Q("agg_theta_set_ops",
      """WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 80),
        |b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value < 20)
        |SELECT
        |  (SELECT count(*) FROM a) AS est_a,
        |  (SELECT count(*) FROM b) AS est_b,
        |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS est_both,
        |  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS est_only_a,
        |  (SELECT count(*) FROM a) AS exact_a,
        |  (SELECT count(*) FROM b) AS exact_b,
        |  (SELECT count(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS exact_both,
        |  (SELECT count(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS exact_only_a""".stripMargin,
    ) { (s, d) =>
      Q.withTempViews(s)("events_theta" -> Tables.events(s, d)) {
        s.sql(
        """WITH a AS (SELECT theta_sketch_agg(user_id, 16) AS s FROM events_theta
          |           WHERE event_type = 'purchase' AND value > 80),
          |b AS (SELECT theta_sketch_agg(user_id, 16) AS s FROM events_theta
          |      WHERE event_type = 'error' AND value < 20)
          |SELECT
          |  CAST(theta_sketch_estimate((SELECT s FROM a)) AS BIGINT) AS est_a,
          |  CAST(theta_sketch_estimate((SELECT s FROM b)) AS BIGINT) AS est_b,
          |  CAST(theta_sketch_estimate(theta_intersection((SELECT s FROM a), (SELECT s FROM b))) AS BIGINT) AS est_both,
          |  CAST(theta_sketch_estimate(theta_difference((SELECT s FROM a), (SELECT s FROM b))) AS BIGINT) AS est_only_a,
          |  (SELECT count(DISTINCT user_id) FROM events_theta
          |   WHERE event_type = 'purchase' AND value > 80) AS exact_a,
          |  (SELECT count(DISTINCT user_id) FROM events_theta
          |   WHERE event_type = 'error' AND value < 20) AS exact_b,
          |  (SELECT count(*) FROM (
          |     SELECT DISTINCT user_id FROM events_theta WHERE event_type = 'purchase' AND value > 80
          |     INTERSECT
          |     SELECT DISTINCT user_id FROM events_theta WHERE event_type = 'error' AND value < 20)) AS exact_both,
          |  (SELECT count(*) FROM (
          |     SELECT DISTINCT user_id FROM events_theta WHERE event_type = 'purchase' AND value > 80
          |     EXCEPT
          |     SELECT DISTINCT user_id FROM events_theta WHERE event_type = 'error' AND value < 20)) AS exact_only_a""".stripMargin,
        )
          // Oracle self-diagnosis (r19 prescription 3): the estimate=
          // exact oracle identity holds ONLY while the sketches stay in
          // exact mode. A QuickSelect theta sketch at lgK=16 is exact to
          // at least k = 2^16 retained hashes; guard at the canonical
          // 15/16·k rebuild fraction (61440, k = 2^16) so a run at an SF
          // whose filtered user sets approach the bound fails with THIS
          // named error instead of a bare DuckDB hash mismatch.
          // assert_true returns NULL when the condition holds, so the
          // filter keeps the row and the schema is unchanged.
          .where(assert_true(
            col("exact_a") < lit(thetaExactGuard) && col("exact_b") < lit(thetaExactGuard),
            lit(s"theta exact-mode bound approached: a filtered user set is within the lgK=16 " +
              s"guard ($thetaExactGuard of 2^16) at this SF — estimates may leave exact mode and " +
              "diverge from the exact INTERSECT/EXCEPT oracle; raise lgK or drop this query to " +
              "a witness-only check")).isNull)
      }
    },

    // ----- mergeable sketches, the re-aggregatable form of approx
    // distinct: one DataSketches HLL per event_type (the shape of a
    // per-day sketch table), unioned into a global estimate WITHOUT
    // touching raw data again — the 100-TB pattern where a year of
    // distinct-user counts comes from 365 sketch rows, not 10^12
    // events. Estimates are engine- and implementation-specific →
    // rows-only check (same standing as agg_approx_distinct); the
    // exact count rides along as the in-row accuracy witness.
    Q.noOracle("agg_hll_sketch_merge") { (s, d) =>
      val events = Tables.events(s, d)
      val sketches = events.groupBy("event_type")
        .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      sketches
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est_distinct_users"))
        .crossJoin(events.agg(countDistinct("user_id").as("exact_distinct_users")))
    },

    // ----- interval OVERLAP join with NO equality key — per error
    // event, the purchases whose 30-minute activity window overlaps its
    // own. The declarative form is a pure inequality join, which Spark
    // can only plan as BroadcastNestedLoopJoin: O(|A|·|B|) compares at
    // ANY scale. The scalable form quantizes time onto a grid no finer
    // than the interval length, EXPLODES each interval to the grid cells
    // it covers (≤ 2 here — cell size = interval length), equi-joins on
    // the cell (a real hash shuffle, prunable, AQE-skew-splittable),
    // dedups the pair (a pair can meet in 2 cells), and applies the
    // exact half-open overlap predicate. Candidates are a guaranteed
    // superset (overlapping intervals share the cell containing their
    // intersection), so the rewrite is lossless; shuffle volume is
    // Σ cells-per-interval ≈ 2·(|A|+|B|) rows, never |A|·|B|. Cells
    // come from integer microsecond arithmetic (exclusive end ⇒ last
    // covered instant is e−1 µs), exact for any timestamp. The oracle
    // runs DuckDB's native inequality (IE) join over the same
    // intervals. Aggregates are order-independent only (count/max) —
    // no float sum enters the hash compare.
    Q(
      "join_interval_overlap",
      """WITH a AS (SELECT event_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
        |           FROM events WHERE event_type = 'error'),
        |b AS (SELECT event_id, value, ts AS s, ts + INTERVAL 30 MINUTE AS e
        |      FROM events WHERE event_type = 'purchase')
        |SELECT a.event_id,
        |       CAST(count(b.event_id) AS INTEGER) AS n_overlap,
        |       CAST(max(b.value) AS DOUBLE) AS max_value
        |FROM a LEFT JOIN b ON a.s < b.e AND b.s < a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    ) { (s, d) =>
      // NO fanout on the sides (r21: tried and REVERTED on measurement —
      // the filtered sides are single-row-group but tiny, and the added
      // repartition exchanges + 32-task scheduling cost MORE than the
      // single-task scans they replaced: warm MeasureQ 2.98 s → 5.35 s.
      // The guard only pays off when the serialized work is CPU-heavy;
      // a cheap scan+explode is not).
      val ev = Tables.events(s, d)
      def side(t: String) = ev
        .where(col("event_type") === t)
        .select(
          col("event_id"), col("value"),
          col("ts").as("s"),
          (col("ts") + expr("INTERVAL 30 MINUTES")).as("e"),
        )
      overlapJoinAgg(side("error"), side("purchase"), cellSeconds = 1800L)
    },
  )

  /** The bucketed interval-overlap kernel behind `join_interval_overlap`,
    * factored out so QueryWitnessSpec can pin losslessness against the
    * naive cross join on adversarial (cell-boundary-aligned) and
    * seeded-random intervals. `a`/`b` carry (event_id, value, s, e) with
    * half-open [s, e). The grid may be ANY size — a finer grid only
    * raises cells-per-interval, never loses candidates — but cell size ≈
    * interval length keeps the explode factor ≤ 2.
    */
  private[graft] def overlapJoinAgg(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      cellSeconds: Long,
  ): org.apache.spark.sql.DataFrame = {
    val cellUs = cellSeconds * 1000000L
    // grid cells covered by [s, e): exact integer-µs arithmetic; the
    // exclusive end means the last covered instant is e − 1 µs
    def cells(df: org.apache.spark.sql.DataFrame) = df.withColumn(
      "cell",
      explode(expr(s"sequence(unix_micros(s) div $cellUs, (unix_micros(e) - 1) div $cellUs)")),
    )
    val pairs = cells(a).as("a")
      .join(
        cells(b).as("b"),
        col("a.cell") === col("b.cell") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e"),
      )
      .select(col("a.event_id").as("event_id"), col("b.event_id").as("b_id"), col("b.value").as("value"))
      .distinct()
    aggPairs(a, pairs)
  }

  /** Multi-level variant of [[overlapJoinAgg]] for HETEROGENEOUS
    * interval lengths (ROADMAP 31): with one grid, Σcells is
    * Σ len/cell — a few long intervals explode to arbitrarily many
    * cells. Here level ℓ has cell size base·2^ℓ (ℓ < `levels`); each
    * interval REGISTERS on the smallest level whose cell covers its
    * length (≤ 2 cells, except at the top level, which caps the
    * hierarchy) and PROBES every level at or above its own (≤ 3 cells
    * per coarser level — a short interval can straddle one boundary of
    * a coarse cell; +1 for the exclusive-end µs). A pair (x, y) with
    * lvl(x) ≤ lvl(y) meets where x probes y's registration level, so
    * candidates = probeA⋈regB ∪ regA⋈probeB is a lossless superset and
    * per-interval work is O(levels), independent of interval length —
    * Σcells is O(L·(|A|+|B|)) for ANY length mix.
    */
  private[graft] def overlapJoinAggLevels(
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame,
      baseCellSeconds: Long,
      levels: Int,
  ): org.apache.spark.sql.DataFrame = {
    require(levels >= 1, s"levels must be >= 1: $levels")
    val baseUs = baseCellSeconds * 1000000L
    // smallest level whose cell >= interval length, capped at levels-1
    def lvl(df: org.apache.spark.sql.DataFrame) = df.withColumn(
      "lvl",
      least(
        greatest(ceil(log(2.0, (unix_micros(col("e")) - unix_micros(col("s"))).cast("double") / baseUs)).cast("int"), lit(0)),
        lit(levels - 1),
      ),
    )
    def cellsAt(levelCol: String) =
      s"sequence(unix_micros(s) div ($baseUs * shiftleft(1L, $levelCol)), (unix_micros(e) - 1) div ($baseUs * shiftleft(1L, $levelCol)))"
    def reg(df: org.apache.spark.sql.DataFrame) = lvl(df)
      .withColumn("cell", explode(expr(cellsAt("lvl"))))
    def probe(df: org.apache.spark.sql.DataFrame) = lvl(df)
      .withColumn("plvl", explode(expr(s"sequence(lvl, ${levels - 1})")))
      .withColumn("cell", explode(expr(cellsAt("plvl"))))
      .withColumn("lvl", col("plvl"))
    def meet(x: org.apache.spark.sql.DataFrame, y: org.apache.spark.sql.DataFrame) =
      x.as("a").join(
        y.as("b"),
        col("a.lvl") === col("b.lvl") && col("a.cell") === col("b.cell") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e"),
      ).select(col("a.event_id").as("event_id"), col("b.event_id").as("b_id"), col("b.value").as("value"))
    val pairs = meet(probe(a), reg(b)).union(meet(reg(a), probe(b))).distinct()
    aggPairs(a, pairs)
  }

  private def aggPairs(
      a: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame =
    a.select("event_id")
      .join(pairs, Seq("event_id"), "left")
      .groupBy("event_id")
      .agg(
        count(col("b_id")).cast("int").as("n_overlap"),
        max(col("value")).cast("double").as("max_value"),
      )
      .orderBy("event_id")
}
