package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative graph computation on the part↔supplier bipartite graph
  * (distinct lineitem pairs, symmetrized). Complements `dedup_clusters`
  * (connected components / label propagation) with a weighted
  * propagation: PageRank.
  *
  * All rank arithmetic is INTEGER micro-units (1e9 = rank 1.0, damping
  * 0.85 as `(85 * s) div 100`, per-edge contribution as integer
  * division by out-degree): float summation order differs between
  * engines and across partitionings, so a double-based rank would never
  * hash-match — the integer form is exactly reproducible everywhere,
  * which is also what you want from a 1000-executor run (bit-identical
  * reruns). Each iteration is one join (rank × edges) + one groupBy —
  * the standard distributed PR shape; edges partition on src and the
  * shuffle is reused across iterations.
  */
object GraphQueries {

  private val iterations = 3

  /** Supplier node ids are offset so the two key spaces cannot collide. */
  private val supplierOffset = 1000000L

  /** Count triangles in an undirected simple graph given as oriented
    * edges `(a, b)` with `a < b` (each undirected edge once). Wedge
    * join on the middle node, closed by an edge lookup — each triangle
    * (x < y < z) materializes exactly once. Reusable so the property
    * spec can pit it against brute force on arbitrary graphs.
    */
  def triangles(e: DataFrame): DataFrame = {
    val wedges = e.join(e.select(col("a").as("b"), col("b").as("z")), "b")
      .select(col("a").as("x"), col("b").as("y"), col("z"))
    wedges.join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
  }

  private def edges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey").as("p"), (col("l_suppkey") + supplierOffset).as("sup"))
      .distinct()
    li.select(col("p").as("src"), col("sup").as("dst"))
      .unionAll(li.select(col("sup").as("src"), col("p").as("dst")))
  }

  val qs: Seq[Q] = Seq(
    Q(
      "graph_pagerank",
      s"""WITH pairs AS (SELECT DISTINCT l_partkey AS p, $supplierOffset + l_suppkey AS sup FROM lineitem),
         |edges AS (SELECT p AS src, sup AS dst FROM pairs
         |          UNION ALL SELECT sup AS src, p AS dst FROM pairs),
         |deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS (SELECT src AS node, 1000000000::BIGINT AS rank FROM deg),
         |r1 AS (SELECT e.dst AS node, 150000000 + (85 * sum(r.rank // d.outdeg)) // 100 AS rank
         |       FROM r0 r JOIN deg d ON d.src = r.node JOIN edges e ON e.src = r.node
         |       GROUP BY e.dst),
         |r2 AS (SELECT e.dst AS node, 150000000 + (85 * sum(r.rank // d.outdeg)) // 100 AS rank
         |       FROM r1 r JOIN deg d ON d.src = r.node JOIN edges e ON e.src = r.node
         |       GROUP BY e.dst),
         |r3 AS (SELECT e.dst AS node, 150000000 + (85 * sum(r.rank // d.outdeg)) // 100 AS rank
         |       FROM r2 r JOIN deg d ON d.src = r.node JOIN edges e ON e.src = r.node
         |       GROUP BY e.dst)
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY rank DESC, node LIMIT 100""".stripMargin,
    ) { (s, d) =>
      // out-degree is pre-joined into the edge relation ONCE and the
      // result cached: each of the 3 iterations is then a single join
      // (rank × edge+deg) + one groupBy, instead of two joins — and
      // lineitem is scanned once, not per iteration. The cache is
      // hash-partitioned on src so every iteration's join reuses that
      // layout and only the (small) rank side shuffles — on a cluster
      // this is the difference between moving the edge relation once
      // vs once per iteration.
      val e = edges(s, d).cache()
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val edgeDeg = e.join(deg, "src").repartition(col("src")).cache()
      var rank = deg.select(col("src").as("node"), lit(1000000000L).as("rank"))
      (1 to iterations).foreach { _ =>
        rank = rank
          .join(edgeDeg, col("src") === col("node"))
          .select(col("dst").as("node2"), expr("rank div outdeg").as("contrib"))
          .groupBy(col("node2").as("node"))
          .agg(expr("150000000 + (85 * sum(contrib)) div 100").as("rank"))
      }
      rank.orderBy(desc("rank"), col("node")).limit(100)
    },

    // ----- triangle counting on the part co-purchase graph: parts are
    // linked when they appear in the same order at least TWICE (the
    // co-occurrence threshold is the hub-pruning dial — the same
    // frequency-cap idea as the jaccard stop-shingle cap; without it a
    // popular part's degree makes the wedge join quadratic). Edges are
    // oriented low-id → high-id so each triangle materializes exactly
    // once; at 100 TB the standard refinement is degree-based
    // orientation (low-degree endpoint first), which bounds wedges per
    // node by sqrt(|E|). Per-order pair generation is quadratic in
    // basket size — bounded here (~7 items); a real pipeline caps it.
    Q(
      "graph_triangles",
      """WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (SELECT a.l_partkey AS a, b.l_partkey AS b, count(*) AS w
        |       FROM pp a JOIN pp b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |       GROUP BY a.l_partkey, b.l_partkey),
        |e AS (SELECT a, b FROM e0 WHERE w >= 2),
        |tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |        FROM e e1 JOIN e e2 ON e2.a = e1.b
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT count(*) FROM e0) AS n_pairs,
        |       (SELECT count(*) FROM e) AS n_edges,
        |       (SELECT count(*) FROM tri) AS n_triangles""".stripMargin,
    ) { (s, d) =>
      val pp = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      // cached: e0 (the expensive per-order pair join + groupBy) feeds
      // both the pair count and the thresholded edge set — one
      // materialization; the filtered re-scans of the cache are cheap
      val e0 = pp.join(pp.select(col("ok"), col("pk").as("pk2")), "ok")
        .where(col("pk") < col("pk2"))
        .groupBy(col("pk").as("a"), col("pk2").as("b"))
        .agg(count(lit(1)).as("w"))
        .cache()
      val e = e0.where(col("w") >= 2).select("a", "b")
      val tri = triangles(e)
      e0.agg(count(lit(1)).as("n_pairs"))
        .crossJoin(e.agg(count(lit(1)).as("n_edges")))
        .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
    },
  )
}
