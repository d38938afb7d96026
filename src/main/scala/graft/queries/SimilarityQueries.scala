package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]`, 64-dim).
  *
  *   - `similarity_topk`: brute-force cosine top-k against a query vector —
  *     the exact baseline. The query side is a 1-row broadcast, so the scan
  *     is a single embarrassingly-parallel pass (no shuffle before top-k).
  *   - `ann_lsh_topk`: the scale path — sign-LSH blocking (axis-aligned
  *     hyperplanes on the first 8 dims → 256 buckets) prunes candidates
  *     before scoring.
  *   - `dedup_embedding_cosine`: near-duplicate pairs within LSH buckets.
  *
  * Dot products / norms are sequential double folds in both engines
  * (Spark `aggregate` ↔ DuckDB `list_reduce`), so cosines are bit-exact
  * and the top-k cut is deterministic.
  */
object SimilarityQueries {

  /** Spark cosine between two double-array columns — the native codegen
    * [[graft.functions.CosineSimilarity]] expression (registered in
    * [[vecs]]). Bit-exact with the zip_with+fold composition it
    * replaced, and with the oracle's list_reduce form.
    */
  private def cosine(a: String, b: String): Column =
    expr(s"cosine_similarity($a, $b)")

  /** Same cosine in DuckDB SQL (list_zip pairs are accessed 1-based). */
  private def cosineSql(a: String, b: String): String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(list_zip($x, $y), p -> p[1] * p[2]), (acc, v) -> acc + v)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }

  /** Squared L2 between two double-array columns — a sequential left
    * fold in both engines (Spark `aggregate` ↔ DuckDB `list_reduce`),
    * so the accumulation order is identical and the result bit-exact,
    * the same determinism argument as [[cosine]]/[[cosineSql]].
    */
  private def l2sq(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (acc, v) -> acc + v)")

  private def l2sqSql(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, v) -> acc + v)"

  // ---- product quantization (Jégou et al., TPAMI 2011), shared by
  // vector_pq_codes and vector_pq_topk: the 64-dim vector splits into
  // M=4 blocks of 16 dims; each block trains its own K=8 codebook with
  // two deterministic Lloyd iterations under squared-L2 (seeds = blocks
  // of vectors 1..8, ties broken by cid — the ann_ivf_trained recipe on
  // subvectors). The codebook is M*K = 32 rows, always broadcast;
  // assignment passes are linear in N*M*K.

  /** Long-form subvector blocks: (vec_id, m, sv). */
  private def pqBlocks(e: DataFrame): DataFrame =
    e.select(
      col("vec_id"),
      explode(expr("transform(sequence(0, 3), m -> struct(m AS m, slice(v, m * 16 + 1, 16) AS sv))"))
        .as("b"),
    ).select(col("vec_id"), col("b.m").as("m"), col("b.sv").as("sv"))

  /** Codebook pivoted to ONE row per block: (m, cbs = array of
    * struct(cid, cv), sorted by cid — cid is unique per block, so the
    * order is total and deterministic). Broadcast-sized by construction
    * (M×K rows in, M rows out).
    */
  private def cbArray(cb: DataFrame): DataFrame =
    cb.groupBy("m").agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbs"))

  /** Nearest centroid of the broadcast `cbs` array by squared L2 —
    * struct(d2, cid), ties to the LOWEST cid: exactly the
    * `ORDER BY d2, cid LIMIT 1` the row_number window computed, but as
    * a pure PROJECTION (no N×K row fanout, no exchange, no sort of N×K
    * rows — at 100 TB the assignment pass is embarrassingly parallel
    * where the window form shuffled the whole corpus per Lloyd
    * iteration), evaluated by the compiled
    * [[graft.functions.NearestCentroidL2]] kernel (the equivalent
    * `array_sort(transform(…aggregate(zip_with(…))))` runs on
    * Catalyst's interpreted lambda path at ~100× the cost — measured
    * before the expression existed).
    */
  private val pqNearest: Column = expr("nearest_centroid_l2(sv, cbs)")

  /** Nearest-centroid assignment as a map-only pass: broadcast the
    * pivoted codebook, evaluate [[pqNearest]] per block row. Output
    * (vec_id, m, sv, cid, d2) — the rn=1 slice of the old window form,
    * value-identical (same d2 folds, same (d2, cid) tiebreak).
    */
  private def pqAssign(blocks: DataFrame, cb: DataFrame): DataFrame =
    blocks.join(broadcast(cbArray(cb)), "m")
      .withColumn("best", pqNearest)
      .select(col("vec_id"), col("m"), col("sv"), col("best.cid").as("cid"), col("best.d2").as("d2"))

  /** Element-wise member mean per (block, centroid) — ONE groupBy with
    * a single compiled [[graft.functions.AvgArray]] aggregate instead of
    * posexplode → groupBy(m, cid, pos) → groupBy(m, cid) + sorted
    * collect_list (two exchanges and a 16× row fanout; r21 replaced that
    * with 16 per-position avg columns, r22 fused them). The aggregate
    * consumes the identical value multisets with the same
    * partial-aggregation structure (per-input-partition partial sums,
    * merged once), and the inputs are float32-derived doubles whose sums
    * are exact at this width, so the means are bit-identical to the
    * posexplode form's.
    */
  private def pqRecenter(a: DataFrame): DataFrame =
    // r22: the 16 per-position avg columns + 16-column reassembly
    // projection become ONE compiled aggregate (the SimHashAgg
    // precedent — this subtree is planned into every Lloyd pass of
    // every PQ query and re-optimized at each adaptive stage boundary).
    // Values bit-identical: same per-position double sums in the same
    // partial/merge order, same sum/count division — AvgArraySpec pins
    // it against the column form.
    a.groupBy("m", "cid")
      .agg(expr("avg_array(sv, 16)").as("cv"))

  /** Two Lloyd iterations over `train` from deterministic seed vectors
    * (by id, ties impossible). Split from assignment so the training
    * side can be a SAMPLE of the corpus — at 100 TB a codebook is
    * trained on a hash-sample (Lloyd passes must not scan the corpus
    * twice each) and only the single assignment pass is full-corpus.
    */
  private def pqTrainOn(train: DataFrame, seedIds: Seq[Long]): DataFrame = {
    val seeds = train.where(col("vec_id").isin(seedIds: _*))
      .select(col("m"), col("vec_id").as("cid"), col("sv").as("cv"))
    pqRecenter(pqAssign(train, pqRecenter(pqAssign(train, seeds))))
  }

  /** Full-corpus training (seeds = vectors 1..8). */
  private def pqTrain(blocks: DataFrame): DataFrame =
    pqTrainOn(blocks, 1L to 8L)

  /** Deterministic 1-in-16 training sample: `vec_id % 16 = 1`, seeded
    * by the sample's own first 8 members.
    */
  private val pqSampleSeedIds: Seq[Long] = (0 until 8).map(i => 1L + 16L * i)

  /** DuckDB mirror of the PQ train+assign pipeline, step for step,
    * ending in `af(vec_id, m, cid, d2)` (and exposing `blk` and `cb2`
    * for the ADC lookup table). Interpolated into each query template;
    * OracleSqlLintSpec guards the double-stripMargin hazard.
    */
  private def pqSqlCteFor(trainRel: String, seedPred: String, assignRel: String = "blk"): String =
    s"""blk AS (SELECT vec_id, m, v[(m * 16 + 1):(m * 16 + 16)] AS sv
       |        FROM v CROSS JOIN (SELECT unnest(range(4)) AS m)),
       |cb0 AS (SELECT m, vec_id AS cid, sv AS cv FROM $trainRel WHERE $seedPred),
       |${(1 to 2).map(it => s"""
       |s$it AS (SELECT b.vec_id, b.m, b.sv, c.cid, ${l2sqSql("b.sv", "c.cv")} AS d2
       |        FROM $trainRel b JOIN cb${it - 1} c ON b.m = c.m),
       |a$it AS (SELECT vec_id, m, sv, cid FROM
       |          (SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |                                        ORDER BY d2, cid) AS rn FROM s$it)
       |        WHERE rn = 1),
       |cb$it AS (SELECT m, cid, list(cav ORDER BY pos) AS cv FROM
       |           (SELECT m, cid, pos, avg(x) AS cav
       |            FROM (SELECT m, cid, generate_subscripts(sv, 1) AS pos, unnest(sv) AS x
       |                  FROM a$it)
       |            GROUP BY m, cid, pos)
       |         GROUP BY m, cid)""".stripMargin).mkString("", ",\n", ",")}
       |sf AS (SELECT b.vec_id, b.m, c.cid, ${l2sqSql("b.sv", "c.cv")} AS d2
       |       FROM $assignRel b JOIN cb2 c ON b.m = c.m),
       |af AS (SELECT vec_id, m, cid, d2 FROM
       |         (SELECT *, row_number() OVER (PARTITION BY vec_id, m
       |                                       ORDER BY d2, cid) AS rn FROM sf)
       |       WHERE rn = 1)""".stripMargin

  private val pqSqlCte = pqSqlCteFor("blk", "vec_id BETWEEN 1 AND 8")

  /** Sampled-training mirror: Lloyd passes scan only the 1-in-16 hash
    * sample; the final `sf`/`af` assignment still scans the full corpus.
    */
  private val pqSampledSqlCte = pqSqlCteFor(
    "(SELECT * FROM blk WHERE vec_id % 16 = 1)",
    s"vec_id IN (${pqSampleSeedIds.mkString(", ")})",
  )

  /** Embeddings with elements pre-cast to double (column `v`); also the
    * single hook where graft's native functions get registered on the
    * (driver-owned) session.
    */
  private[graft] def vecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  private val vecsSqlCte =
    "v AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

  /** Sign-LSH bucket over the first 8 dims: '10110100'-style key. */
  private val bucketExpr =
    "array_join(transform(slice(v, 1, 8), x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
  private val bucketSql =
    "array_to_string(list_transform(v[1:8], x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"

  /** Coarse-centroid set pivoted to ONE broadcastable row:
    * cbs = array of struct(cid, cv), sorted by the (unique) cid.
    * The IVF analogue of [[cbArray]].
    */
  private def centsArray(cents: DataFrame): DataFrame =
    cents.agg(array_sort(collect_list(struct(col("cid"), col("cv")))).as("cbs"))

  /** Every centroid of the broadcast `cbs` scored against `$v` by
    * cosine, sorted best-first: array of struct(na = −acos, cid)
    * ascending — (na, cid) ascending IS (acos DESC, cid ASC), the exact
    * ordering of the row_number windows this replaces (negation is a
    * bit-exact involution on non-NaN doubles, and the fixture has no
    * zero-norm vectors, so no NaN enters the sort). Evaluating it as a
    * projection removes the N×K crossJoin fanout AND the per-vector
    * window exchange+sort — the assignment pass becomes map-only, which
    * is also the correct 100-TB shape (the corpus never shuffles to get
    * labeled). Compiled kernel: [[graft.functions.CentroidRankCos]]
    * (the HOF spelling runs interpreted at ~100× the cost).
    */
  private def ivfSortedSql(v: String): String = s"centroid_rank_cos($v, cbs)"

  private def ivfSorted(v: String): Column = expr(ivfSortedSql(v))

  val qs: Seq[Q] = Seq(

    // ----- brute-force cosine top-k (exact ANN baseline)
    Q(
      "similarity_topk",
      s"""WITH $vecsSqlCte,
         |q AS (SELECT v AS qv FROM v WHERE vec_id = 0)
         |SELECT vec_id, label, round(${cosineSql("v", "qv")}, 6) AS sim
         |FROM v CROSS JOIN q WHERE vec_id <> 0
         |ORDER BY ${cosineSql("v", "qv")} DESC, vec_id LIMIT 10""".stripMargin,
    ) { (s, d) =>
      val e = vecs(s, d)
      val q = broadcast(e.where(col("vec_id") === 0).select(col("v").as("qv")))
      e.where(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("sim_exact", cosine("v", "qv"))
        .orderBy(col("sim_exact").desc, col("vec_id"))
        .select(col("vec_id"), col("label"), round(col("sim_exact"), 6).as("sim"))
        .limit(10)
    },

    // ----- LSH-blocked ANN top-k: only candidates in the query's sign bucket
    Q(
      "ann_lsh_topk",
      s"""WITH $vecsSqlCte,
         |b AS (SELECT vec_id, label, v, $bucketSql AS bucket FROM v),
         |q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
         |SELECT vec_id, label, bucket, round(${cosineSql("v", "qv")}, 6) AS sim
         |FROM b JOIN q ON bucket = qbucket WHERE vec_id <> 0
         |ORDER BY ${cosineSql("v", "qv")} DESC, vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      val b = vecs(s, d).withColumn("bucket", expr(bucketExpr))
      val q = broadcast(b.where(col("vec_id") === 0).select(col("v").as("qv"), col("bucket").as("qbucket")))
      b.join(q, col("bucket") === col("qbucket"))
        .where(col("vec_id") =!= 0)
        .withColumn("sim_exact", cosine("v", "qv"))
        .orderBy(col("sim_exact").desc, col("vec_id"))
        .select(col("vec_id"), col("label"), col("bucket"), round(col("sim_exact"), 6).as("sim"))
        .limit(5)
    },

    // ----- IVF ANN top-k: the other scale path. "Train" picks vectors
    // 1..16 as coarse centroids (deterministic, oracle-reproducible);
    // every vector joins its nearest centroid's inverted list (linear
    // N*K assignment pass, the real IVF cost); the query probes its
    // nprobe=2 nearest lists and scores only those members.
    Q(
      "ann_ivf_topk",
      s"""WITH $vecsSqlCte,
         |c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id BETWEEN 1 AND 16),
         |scored0 AS (SELECT v.vec_id, v.label, v.v, c.cid,
         |                   ${cosineSql("v.v", "c.cv")} AS acos
         |            FROM v CROSS JOIN c),
         |scored AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                        ORDER BY acos DESC, cid) AS rn
         |           FROM scored0),
         |members AS (SELECT vec_id, label, v, cid FROM scored WHERE rn = 1),
         |probes AS (SELECT cid FROM scored WHERE vec_id = 0 AND rn <= 2),
         |q AS (SELECT v AS qv FROM v WHERE vec_id = 0)
         |SELECT m.vec_id, m.label, m.cid, round(${cosineSql("m.v", "qv")}, 6) AS sim
         |FROM members m JOIN probes p ON m.cid = p.cid CROSS JOIN q
         |WHERE m.vec_id <> 0
         |ORDER BY ${cosineSql("m.v", "qv")} DESC, m.vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      // assignment + probe selection as PROJECTIONS over the broadcast
      // pivoted centroid array (see ivfSorted) — the N×16 crossJoin +
      // per-vector window this replaces shuffled and sorted the whole
      // corpus just to pick each vector's argmax centroid
      val e = vecs(s, d)
      val centsArr = broadcast(centsArray(
        e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("cid"), col("v").as("cv")),
      ))
      val members = e.crossJoin(centsArr)
        .select(col("vec_id"), col("label"), col("v"), element_at(ivfSorted("v"), 1)("cid").as("cid"))
      val probes = broadcast(
        e.where(col("vec_id") === 0).crossJoin(centsArr)
          .select(explode(expr(s"slice(${ivfSortedSql("v")}, 1, 2)")).as("p"))
          .select(col("p.cid").as("pcid")),
      )
      val q = broadcast(e.where(col("vec_id") === 0).select(col("v").as("qv")))
      members
        .join(probes, col("cid") === col("pcid"))
        .where(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("sim_exact", cosine("v", "qv"))
        .orderBy(col("sim_exact").desc, col("vec_id"))
        .select(col("vec_id"), col("label"), col("cid"), round(col("sim_exact"), 6).as("sim"))
        .limit(5)
    },

    // ----- multi-probe LSH ANN: the recall fix for single-bucket probing.
    // A query near a hyperplane boundary has near-neighbors one sign flip
    // away, and a single hot bucket concentrates work; probing the query
    // bucket plus its 8 Hamming-1 neighbors (9 broadcast keys) recovers
    // both — candidates stay bucket-bounded, never all-pairs.
    Q(
      "ann_lsh_multiprobe",
      s"""WITH $vecsSqlCte,
         |b AS (SELECT vec_id, label, v, $bucketSql AS bucket FROM v),
         |q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0),
         |probes AS (SELECT qv, unnest(list_prepend(qbucket,
         |             list_transform(range(1, 9), i ->
         |               substr(qbucket, 1, i - 1) ||
         |               (CASE WHEN substr(qbucket, i, 1) = '1' THEN '0' ELSE '1' END) ||
         |               substr(qbucket, i + 1)))) AS pbucket
         |           FROM q)
         |SELECT vec_id, label, bucket, round(${cosineSql("v", "qv")}, 6) AS sim
         |FROM b JOIN probes ON bucket = pbucket WHERE vec_id <> 0
         |ORDER BY ${cosineSql("v", "qv")} DESC, vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      val b = vecs(s, d).withColumn("bucket", expr(bucketExpr))
      val probes = broadcast(
        b.where(col("vec_id") === 0)
          .select(
            col("v").as("qv"),
            explode(expr(
              """concat(array(bucket),
                |       transform(sequence(1, 8), i ->
                |         concat(substring(bucket, 1, i - 1),
                |                CASE WHEN substring(bucket, i, 1) = '1' THEN '0' ELSE '1' END,
                |                substring(bucket, i + 1, 8))))""".stripMargin,
            )).as("pbucket"),
          ),
      )
      b.join(probes, col("bucket") === col("pbucket"))
        .where(col("vec_id") =!= 0)
        .withColumn("sim_exact", cosine("v", "qv"))
        .orderBy(col("sim_exact").desc, col("vec_id"))
        .select(col("vec_id"), col("label"), col("bucket"), round(col("sim_exact"), 6).as("sim"))
        .limit(5)
    },

    // ----- exact batch kNN join: top-3 neighbors for EACH of 10 query
    // vectors in one job, via operators.AnnSearch — queries broadcast,
    // one corpus scan, per-query top-k as a WindowGroupLimit map-side
    // heap (the shuffle carries <= queries*k rows per task regardless of
    // corpus size). The oracled instantiation of the batch-retrieval
    // path; AnnSearchSpec pins the ANN variants' recall against it.
    Q(
      "ann_knn_join",
      s"""WITH $vecsSqlCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 10),
         |sc AS (SELECT q.qid, v.vec_id, v.label, ${cosineSql("v.v", "q.qv")} AS sim
         |       FROM v CROSS JOIN q WHERE v.vec_id <> q.qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY sim DESC, vec_id) AS rn FROM sc)
         |SELECT qid, vec_id, label, round(sim, 6) AS sim
         |FROM r WHERE rn <= 3 ORDER BY qid, vec_id""".stripMargin,
    ) { (s, d) =>
      graft.operators.AnnSearch.exact(vecs(s, d), 0L until 10L, 3)
        .select(col("qid"), col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))
        .orderBy("qid", "vec_id")
    },

    // ----- IVF-routed bulk kNN join: ann_knn_join's scale path. The
    // brute-force form scores Q×N pairs; here BOTH sides go through the
    // seeded 16-list coarse quantizer (the ann_ivf_topk recipe — one
    // broadcast assignment pass each), queries keep their nprobe=2
    // nearest lists, and the candidate join runs ON cid — each query
    // only ever meets its probed lists' members, so the scored-pair
    // count is Σ_q Σ_{probed lists} |list| instead of Q×N. At large Q
    // the cid join is an ordinary shuffle join co-partitioned on the
    // list id (queries per list ≈ Q·nprobe/K, members per list ≈ N/K —
    // both sides partition-bounded); at this Q the 20-row probe side
    // broadcasts. Fully ORACLED: assignment, probes, and the routed
    // join replay step for step in DuckDB.
    Q(
      "ann_ivf_knn_join",
      s"""WITH $vecsSqlCte,
         |c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id BETWEEN 1 AND 16),
         |scored0 AS (SELECT v.vec_id, v.label, v.v, c.cid,
         |                   ${cosineSql("v.v", "c.cv")} AS acos
         |            FROM v CROSS JOIN c),
         |scored AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                        ORDER BY acos DESC, cid) AS rn
         |           FROM scored0),
         |members AS (SELECT vec_id, label, v, cid FROM scored WHERE rn = 1),
         |qprobes AS (SELECT vec_id AS qid, v AS qv, cid
         |            FROM scored WHERE vec_id < 10 AND rn <= 2),
         |sc AS (SELECT p.qid, m.vec_id, m.label, m.cid,
         |              ${cosineSql("m.v", "p.qv")} AS sim
         |       FROM members m JOIN qprobes p ON m.cid = p.cid
         |       WHERE m.vec_id <> p.qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY sim DESC, vec_id) AS rn FROM sc)
         |SELECT qid, vec_id, label, cid, round(sim, 6) AS sim
         |FROM r WHERE rn <= 3 ORDER BY qid, vec_id""".stripMargin,
    ) { (s, d) =>
      // assignment + per-query probe lists as projections over the
      // broadcast pivoted centroid array (ivfSorted) — replaces the
      // N×16 crossJoin + per-vector window (see ann_ivf_topk)
      val e = vecs(s, d)
      val centsArr = broadcast(centsArray(
        e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("cid"), col("v").as("cv")),
      ))
      val members = e.crossJoin(centsArr)
        .select(col("vec_id"), col("label"), col("v"), element_at(ivfSorted("v"), 1)("cid").as("cid"))
      val qprobes = broadcast(
        e.where(col("vec_id") < 10).crossJoin(centsArr)
          .select(
            col("vec_id").as("qid"), col("v").as("qv"),
            explode(expr(s"slice(${ivfSortedSql("v")}, 1, 2)")).as("p"),
          )
          .select(col("qid"), col("qv"), col("p.cid").as("pcid")),
      )
      val wTop = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
      members.join(qprobes, col("cid") === col("pcid"))
        .where(col("vec_id") =!= col("qid"))
        .withColumn("sim", cosine("v", "qv"))
        .withColumn("rnq", row_number().over(wTop))
        .where(col("rnq") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), col("cid"), round(col("sim"), 6).as("sim"))
        .orderBy("qid", "vec_id")
    },

    // ----- MMR diversity selection (Carbonell & Goldstein, SIGIR 1998):
    // the training-data/rerank form of top-k — greedily pick k=4 items
    // per query maximizing 0.7·relevance − 0.3·max-similarity-to-
    // already-picked, over a per-query candidate pool of the top-8 by
    // cosine. The pool cut is the distributed part (one corpus scan +
    // WindowGroupLimit, exactly ann_knn_join's shape); the greedy walk
    // is inherently sequential in k but pool-bounded, so it runs per
    // query inside mapGroups — queries parallelize, no driver collect,
    // and at 100 TB the pool stays k-scaled while the scan does the
    // work. Pairwise sims use the same left-fold double arithmetic as
    // the cosine expression, so picks are bit-stable cross-engine.
    // Fully ORACLED: DuckDB replays the greedy walk as 4 unrolled
    // argmax stages over the same pool and pairwise-sim table.
    Q(
      "select_mmr_diverse",
      s"""WITH $vecsSqlCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 5),
         |sc AS (SELECT q.qid, v.vec_id, v.v, ${cosineSql("v.v", "q.qv")} AS rel
         |       FROM v CROSS JOIN q WHERE v.vec_id <> q.qid),
         |pool AS (SELECT * FROM
         |           (SELECT *, row_number() OVER (PARTITION BY qid
         |                                         ORDER BY rel DESC, vec_id) AS rn FROM sc)
         |         WHERE rn <= 8),
         |pp AS (SELECT a.qid, a.vec_id AS ca, b.vec_id AS cb,
         |              ${cosineSql("a.v", "b.v")} AS psim
         |       FROM pool a JOIN pool b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
         |s1 AS (SELECT qid, vec_id, rel FROM pool WHERE rn = 1),
         |${(2 to 4).map { i =>
           val sel = (1 until i).map(j => s"SELECT qid, vec_id FROM s$j").mkString(" UNION ALL ")
           s"""sel$i AS ($sel),
           |cand$i AS (SELECT p.qid, p.vec_id, p.rel,
           |                  0.7 * p.rel - 0.3 * max(pp.psim) AS score
           |           FROM pool p
           |           JOIN pp ON pp.qid = p.qid AND pp.ca = p.vec_id
           |           JOIN sel$i sl ON sl.qid = pp.qid AND sl.vec_id = pp.cb
           |           LEFT JOIN sel$i dn ON dn.qid = p.qid AND dn.vec_id = p.vec_id
           |           WHERE dn.vec_id IS NULL
           |           GROUP BY p.qid, p.vec_id, p.rel),
           |s$i AS (SELECT qid, vec_id, rel FROM
           |          (SELECT *, row_number() OVER (PARTITION BY qid
           |                                        ORDER BY score DESC, vec_id) AS rn FROM cand$i)
           |        WHERE rn = 1)""".stripMargin
         }.mkString(",\n")}
         |SELECT qid, pick, vec_id, round(rel, 6) AS rel FROM (
         |${(1 to 4).map(i => s"SELECT qid, $i AS pick, vec_id, rel FROM s$i").mkString(" UNION ALL ")}
         |) ORDER BY qid, pick""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val e = vecs(s, d)
      val q = broadcast(e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv")))
      val wPool = Window.partitionBy("qid").orderBy(desc("rel"), col("vec_id"))
      val pool = e.crossJoin(q)
        .where(col("vec_id") =!= col("qid"))
        .withColumn("rel", cosine("v", "qv"))
        .withColumn("rn", row_number().over(wPool))
        .where(col("rn") <= 8)
        .select(col("qid").as("_1"), col("vec_id").as("_2"), col("rel").as("_3"), col("v").as("_4"))
        .as[(Long, Long, Double, Seq[Double])]
      // per-element left folds, the exact accumulation order of the
      // cosine expression and DuckDB's list_reduce — picks stay
      // bit-stable cross-engine
      def sim(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      pool.groupByKey(_._1)
        .flatMapGroups { (qid, it) =>
          val cands = it.map { case (_, id, rel, v) => (id, rel, v.toArray) }.toArray
            .sortBy { case (id, rel, _) => (-rel, id) }
          val picked = scala.collection.mutable.ArrayBuffer(cands.head)
          while (picked.size < 4 && picked.size < cands.length) {
            val best = cands.iterator
              .filterNot(c => picked.exists(_._1 == c._1))
              .map { c =>
                val pen = picked.iterator.map(p => sim(c._3, p._3)).max
                (c, 0.7 * c._2 - 0.3 * pen)
              }
              // strict > keeps the first (lowest-id, since cands is
              // rel-sorted only) — match the oracle's ORDER BY score
              // DESC, vec_id by tie-breaking on id explicitly
              .reduceLeft((x, y) => if (y._2 > x._2 || (y._2 == x._2 && y._1._1 < x._1._1)) y else x)
            picked += best._1
          }
          picked.iterator.zipWithIndex.map { case ((id, rel, _), ix) => (qid, ix + 1, id, rel) }
        }
        .toDF("qid", "pick", "vec_id", "rel")
        .select(col("qid"), col("pick"), col("vec_id"), round(col("rel"), 6).as("rel"))
        .orderBy("qid", "pick")
    },

    // ----- MMR with pool re-expansion (ROADMAP 78): when k approaches
    // the candidate-pool size the greedy walk degenerates — every pool
    // member gets picked regardless of diversity. The scale fix keeps
    // the pool in TIERS of the same one-scan window cut (rn ≤ 4, then
    // rn ≤ 12): the walk runs over the first tier, and on exhausting it
    // re-expands to the next tier and CONTINUES with the picked set
    // intact — bounded restarts, never a second corpus scan (both tiers
    // come from the one WindowGroupLimit pass). Here k=6 over a 4-item
    // first tier, so picks 5–6 demonstrably come from the re-expanded
    // pool. Fully ORACLED: the walk unrolls to 6 argmax stages, stages
    // 1–4 over the first tier, 5–6 over the expanded pool — certifying
    // the tier switch, not just the greedy order. Same bit-stable
    // left-fold cosine as select_mmr_diverse.
    Q(
      "select_mmr_expand",
      s"""WITH $vecsSqlCte,
         |q AS (SELECT vec_id AS qid, v AS qv FROM v WHERE vec_id < 5),
         |sc AS (SELECT q.qid, v.vec_id, v.v, ${cosineSql("v.v", "q.qv")} AS rel
         |       FROM v CROSS JOIN q WHERE v.vec_id <> q.qid),
         |pool AS (SELECT * FROM
         |           (SELECT *, row_number() OVER (PARTITION BY qid
         |                                         ORDER BY rel DESC, vec_id) AS rn FROM sc)
         |         WHERE rn <= 12),
         |pp AS (SELECT a.qid, a.vec_id AS ca, b.vec_id AS cb,
         |              ${cosineSql("a.v", "b.v")} AS psim
         |       FROM pool a JOIN pool b ON a.qid = b.qid AND a.vec_id <> b.vec_id),
         |s1 AS (SELECT qid, vec_id, rel FROM pool WHERE rn = 1),
         |${(2 to 6).map { i =>
           val tier = if (i <= 4) "p.rn <= 4" else "p.rn <= 12"
           val sel = (1 until i).map(j => s"SELECT qid, vec_id FROM s$j").mkString(" UNION ALL ")
           s"""sel$i AS ($sel),
           |cand$i AS (SELECT p.qid, p.vec_id, p.rel,
           |                  0.7 * p.rel - 0.3 * max(pp.psim) AS score
           |           FROM pool p
           |           JOIN pp ON pp.qid = p.qid AND pp.ca = p.vec_id
           |           JOIN sel$i sl ON sl.qid = pp.qid AND sl.vec_id = pp.cb
           |           LEFT JOIN sel$i dn ON dn.qid = p.qid AND dn.vec_id = p.vec_id
           |           WHERE dn.vec_id IS NULL AND $tier
           |           GROUP BY p.qid, p.vec_id, p.rel),
           |s$i AS (SELECT qid, vec_id, rel FROM
           |          (SELECT *, row_number() OVER (PARTITION BY qid
           |                                        ORDER BY score DESC, vec_id) AS rn FROM cand$i)
           |        WHERE rn = 1)""".stripMargin
         }.mkString(",\n")}
         |SELECT qid, pick, vec_id, round(rel, 6) AS rel FROM (
         |${(1 to 6).map(i => s"SELECT qid, $i AS pick, vec_id, rel FROM s$i").mkString(" UNION ALL ")}
         |) ORDER BY qid, pick""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val e = vecs(s, d)
      val q = broadcast(e.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("v").as("qv")))
      val wPool = Window.partitionBy("qid").orderBy(desc("rel"), col("vec_id"))
      val pool = e.crossJoin(q)
        .where(col("vec_id") =!= col("qid"))
        .withColumn("rel", cosine("v", "qv"))
        .withColumn("rn", row_number().over(wPool))
        .where(col("rn") <= 12)
        .select(col("qid").as("_1"), col("vec_id").as("_2"), col("rel").as("_3"),
          col("v").as("_4"), col("rn").as("_5"))
        .as[(Long, Long, Double, Seq[Double], Int)]
      def sim(a: Array[Double], b: Array[Double]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      pool.groupByKey(_._1)
        .flatMapGroups { (qid, it) =>
          val cands = it.map { case (_, id, rel, v, rn) => (id, rel, v.toArray, rn) }.toArray
            .sortBy { case (id, rel, _, _) => (-rel, id) }
          val picked = scala.collection.mutable.ArrayBuffer(cands.head)
          while (picked.size < 6 && picked.size < cands.length) {
            // tier gate: the walk sees rn <= 4 until that tier is
            // exhausted, then re-expands to the full pool mid-walk
            val tierCap = if (picked.size < 4) 4 else 12
            val best = cands.iterator
              .filter(c => c._4 <= tierCap && !picked.exists(_._1 == c._1))
              .map { c =>
                val pen = picked.iterator.map(p => sim(c._3, p._3)).max
                (c, 0.7 * c._2 - 0.3 * pen)
              }
              .reduceLeft((x, y) => if (y._2 > x._2 || (y._2 == x._2 && y._1._1 < x._1._1)) y else x)
            picked += best._1
          }
          picked.iterator.zipWithIndex.map { case ((id, rel, _, _), ix) => (qid, ix + 1, id, rel) }
        }
        .toDF("qid", "pick", "vec_id", "rel")
        .select(col("qid"), col("pick"), col("vec_id"), round(col("rel"), 6).as("rel"))
        .orderBy("qid", "pick")
    },

    // ----- semi-hard negative mining (Schroff et al., FaceNet 2015 /
    // dense-retrieval training sets): for each query, the most-similar
    // items of a DIFFERENT label, capped below a near-dup ceiling —
    // negatives similar enough to teach the margin, filtered of
    // probable mislabels (sim >= 0.95 is near-dup territory, the
    // classic false-negative trap). Same distributed shape as
    // ann_knn_join (one scan, broadcast queries, WindowGroupLimit
    // top-k); the label filter and ceiling ride the join condition so
    // pruned pairs never reach the heap. Fully ORACLED.
    Q(
      "mine_hard_negatives",
      s"""WITH $vecsSqlCte,
         |q AS (SELECT vec_id AS qid, label AS qlabel, v AS qv FROM v WHERE vec_id < 5),
         |sc AS (SELECT q.qid, v.vec_id, v.label, ${cosineSql("v.v", "q.qv")} AS sim
         |       FROM v CROSS JOIN q
         |       WHERE v.label <> q.qlabel AND ${cosineSql("v.v", "q.qv")} < 0.95),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid
         |                                   ORDER BY sim DESC, vec_id) AS rn FROM sc)
         |SELECT qid, vec_id, label, round(sim, 6) AS sim
         |FROM r WHERE rn <= 3 ORDER BY qid, vec_id""".stripMargin,
    ) { (s, d) =>
      val e = vecs(s, d)
      val q = broadcast(
        e.where(col("vec_id") < 5)
          .select(col("vec_id").as("qid"), col("label").as("qlabel"), col("v").as("qv")),
      )
      val wTop = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
      e.join(q, col("label") =!= col("qlabel") && cosine("v", "qv") < 0.95)
        .withColumn("sim", cosine("v", "qv"))
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") <= 3)
        .select(col("qid"), col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))
        .orderBy("qid", "vec_id")
    },

    // ----- graph-index ANN (NSW, the single-layer HNSW core): per-
    // partition navigable-small-world graphs built and searched inside
    // mapPartitions, broadcast query batch, WindowGroupLimit top-k
    // merge — the third ANN family (connectivity-bounded) next to
    // sign-LSH and IVF (space-partition-bounded). no_oracle: a greedy
    // graph walk has no sane SQL replay; AnnSearchSpec pins recall@k
    // floors against exact brute force, the efSearch monotonicity law,
    // and determinism.
    Q.noOracle("ann_nsw_topk") { (s, d) =>
      graft.operators.NswSearch.nsw(vecs(s, d), 0L until 10L, k = 3)
        .select(col("qid"), col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))
        .orderBy("qid", "vec_id")
    },

    // ----- centroid-routed NSW over a persisted shard index: shard
    // assignment by the IVF coarse quantizer, so a query batch probes
    // only its nprobe nearest shards (a static partition filter on the
    // index scan) instead of every shard — the partition-pruned form of
    // ann_nsw_topk. no_oracle like every graph walk; NswIndexSpec pins
    // the <=nprobe scan, the recall ladder (monotone in nprobe), and
    // that nprobe=nShards equals the probe-everything reader exactly.
    // The index comes from the per-corpus StoreCache, so this query
    // prices the PROBE (the store's steady-state cost); the build is
    // paid once per fixture and laddered in AnnBench.
    Q.noOracle("ann_nsw_routed_topk") { (s, d) =>
      val e = vecs(s, d)
      val path = StoreCache.resolve(d, "nsw-routed") { p =>
        graft.operators.NswSearch.buildIndexRouted(e, p, nShards = 8, lloydIters = 1, seedIds = Some(1L to 8L))
      }
      val queries = e.where(col("vec_id").isin((0L until 10L): _*))
        .select(col("vec_id"), col("v")).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
      graft.operators.NswSearch.searchIndexRouted(s, path, queries, k = 3, nprobe = 2)
        .select(col("qid"), col("vec_id"), col("label"), round(col("sim"), 6).as("sim"))
        .orderBy("qid", "vec_id")
    },

    // ----- grouped top-k: top-3 nearest per label via the typed O(k)-state
    // [[graft.operators.TopKAggregator]] (map-side partial top-k, one
    // shuffle of k-row states per label) — where a window + filter would
    // shuffle and fully sort every group's candidates instead.
    Q(
      "similarity_topk_grouped",
      s"""WITH $vecsSqlCte,
         |q AS (SELECT v AS qv FROM v WHERE vec_id = 0),
         |sc AS (SELECT label, vec_id, ${cosineSql("v", "qv")} AS sim_exact
         |       FROM v CROSS JOIN q WHERE vec_id <> 0),
         |r AS (SELECT *, row_number() OVER (PARTITION BY label
         |                                   ORDER BY sim_exact DESC, vec_id) AS rn FROM sc)
         |SELECT label, vec_id, round(sim_exact, 6) AS sim
         |FROM r WHERE rn <= 3 ORDER BY label, vec_id""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val e = vecs(s, d)
      val q = broadcast(e.where(col("vec_id") === 0).select(col("v").as("qv")))
      val scored = e.where(col("vec_id") =!= 0)
        .crossJoin(q)
        .select(col("label").as("_1"), col("vec_id").as("_2"), cosine("v", "qv").as("_3"))
        .as[(Int, Long, Double)]
      scored
        .groupByKey(_._1)
        .mapValues { case (_, id, sim) => (id, sim) }
        .agg(new graft.operators.TopKAggregator(3).toColumn.name("top"))
        .flatMap { case (label, top) => top.map { case (sim, id) => (label, id, sim) } }
        .toDF("label", "vec_id", "sim")
        .select(col("label"), col("vec_id"), round(col("sim"), 6).as("sim"))
        .orderBy("label", "vec_id")
    },

    // ----- trained-IVF ANN: ann_ivf_topk with the centroids refined by two
    // deterministic Lloyd iterations (assign to nearest-by-cosine centroid,
    // re-center as the element-wise member mean), replayed step-for-step by
    // the oracle. Each iteration is one broadcast-join assignment pass plus
    // a (cid, pos)-partitioned mean — linear in N, no pairwise blowup; the
    // mean parallelizes over dims × centroids exactly like vector_centroids.
    Q(
      "ann_ivf_trained",
      s"""WITH $vecsSqlCte,
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id BETWEEN 1 AND 16),
         |${(1 to 2).map(it => s"""
         |s$it AS (SELECT v.vec_id, v.v, c.cid, ${cosineSql("v.v", "c.cv")} AS acos
         |        FROM v CROSS JOIN c${it - 1} c),
         |a$it AS (SELECT vec_id, v, cid FROM
         |          (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                        ORDER BY acos DESC, cid) AS rn FROM s$it)
         |        WHERE rn = 1),
         |c$it AS (SELECT cid, list(cav ORDER BY pos) AS cv FROM
         |          (SELECT cid, pos, avg(x) AS cav
         |           FROM (SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM a$it)
         |           GROUP BY cid, pos)
         |        GROUP BY cid)""".stripMargin).mkString("", ",\n", ",")}
         |sf AS (SELECT v.vec_id, v.label, v.v, c.cid, ${cosineSql("v.v", "c.cv")} AS acos
         |       FROM v CROSS JOIN c2 c),
         |af AS (SELECT * FROM
         |         (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                       ORDER BY acos DESC, cid) AS rn FROM sf)
         |       WHERE rn = 1),
         |probes AS (SELECT cid FROM
         |             (SELECT cid, row_number() OVER (ORDER BY acos DESC, cid) AS rn
         |              FROM sf WHERE vec_id = 0)
         |           WHERE rn <= 2),
         |q AS (SELECT v AS qv FROM v WHERE vec_id = 0)
         |SELECT m.vec_id, m.label, m.cid, round(${cosineSql("m.v", "qv")}, 6) AS sim
         |FROM af m JOIN probes p ON m.cid = p.cid CROSS JOIN q
         |WHERE m.vec_id <> 0
         |ORDER BY ${cosineSql("m.v", "qv")} DESC, m.vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      val e = vecs(s, d)
      // one Lloyd step as a MAP-ONLY pass over the broadcast pivoted
      // centroid array (ivfSorted — replaces the N×K crossJoin + window
      // exchange+sort per iteration); re-center as ONE groupBy with 64
      // per-position avg columns (same value-exactness argument as
      // pqRecenter: identical multisets of float32-derived doubles,
      // identical partial-agg structure)
      def assign(cents: DataFrame): DataFrame =
        e.crossJoin(broadcast(centsArray(cents)))
          .select(col("vec_id"), col("v"), element_at(ivfSorted("v"), 1)("cid").as("cid"))
      def recenter(assigned: DataFrame): DataFrame =
        // r22: ONE compiled aggregate instead of 64 avg columns + a
        // 64-column reassembly (see pqRecenter; AvgArraySpec pins the
        // bit-exact equivalence)
        assigned.groupBy("cid")
          .agg(expr("avg_array(v, 64)").as("cv"))
      val seeds = e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("cid"), col("v").as("cv"))
      val trained = recenter(assign(recenter(assign(seeds))))
      val trainedArr = broadcast(centsArray(trained))
      val finalAssign = e.crossJoin(trainedArr)
        .select(col("vec_id"), col("label"), col("v"), element_at(ivfSorted("v"), 1)("cid").as("cid"))
      val probes = broadcast(
        e.where(col("vec_id") === 0).crossJoin(trainedArr)
          .select(explode(expr(s"slice(${ivfSortedSql("v")}, 1, 2)")).as("p"))
          .select(col("p.cid").as("pcid")),
      )
      val q = broadcast(e.where(col("vec_id") === 0).select(col("v").as("qv")))
      finalAssign
        .join(probes, col("cid") === col("pcid"))
        .where(col("vec_id") =!= 0)
        .crossJoin(q)
        .withColumn("sim_exact", cosine("v", "qv"))
        .orderBy(col("sim_exact").desc, col("vec_id"))
        .select(col("vec_id"), col("label"), col("cid"), round(col("sim_exact"), 6).as("sim"))
        .limit(5)
    },

    // ----- per-label centroids: element-wise mean of embeddings, long
    // form (label, pos, avg) — posexplode + groupBy partitions by
    // (label, pos), so the reduction parallelizes over dims x labels
    Q(
      "vector_centroids",
      s"""WITH $vecsSqlCte,
         |u AS (SELECT label, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM v)
         |SELECT label, CAST(pos - 1 AS INTEGER) AS pos, round(avg(x), 6) AS centroid_val,
         |       count(*) AS n
         |FROM u GROUP BY label, pos ORDER BY label, pos""".stripMargin,
    ) { (s, d) =>
      vecs(s, d)
        .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "pos")
        .agg(round(avg("x"), 6).as("centroid_val"), count(lit(1)).as("n"))
        .orderBy("label", "pos")
    },

    // ----- embedding near-duplicate pairs, LSH-bucketed (pairs only form
    // within a bucket — at scale this is the shuffle-bounded variant of
    // the quadratic all-pairs cosine)
    Q(
      "dedup_embedding_cosine",
      s"""WITH $vecsSqlCte,
         |b AS (SELECT vec_id, v, $bucketSql AS bucket FROM v)
         |SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
         |       round(${cosineSql("x.v", "y.v")}, 6) AS cos_sim
         |FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
         |WHERE ${cosineSql("x.v", "y.v")} >= 0.2
         |ORDER BY vec_a, vec_b""".stripMargin,
    ) { (s, d) =>
      val b = vecs(s, d).withColumn("bucket", expr(bucketExpr)).select("vec_id", "v", "bucket")
      val sim = cosine("x.v", "y.v")
      b.as("x")
        .join(b.as("y"), col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .where(sim >= 0.2)
        .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), round(sim, 6).as("cos_sim"))
        .orderBy("vec_a", "vec_b")
    },

    // ----- SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    // dedup = cluster, then prune within clusters. Assign every vector
    // to its nearest of K=16 seeded centroids (the ann_ivf_topk recipe —
    // deterministic, oracle-reproducible); within each cluster, rank
    // members FARTHEST-from-centroid first (the paper keeps the
    // low-centroid-similarity representative of every duplicate group —
    // the diversity-preserving choice) and drop a member when any
    // earlier-ranked cluster-mate is cosine-similar above tau=0.3 (the
    // paper's greedy: suppression by rank order, one pass, no iteration;
    // the oracle spells the anti-join as LEFT JOIN ... IS NULL — DuckDB
    // cannot bind correlated outer references inside list lambdas, so a
    // NOT EXISTS over the cosine fold fails to parse).
    // Scale shape: the clusters bound the quadratic to sum(c_k^2); at
    // corpus scale K grows with N (the IvfStore / sqrt(N) discipline) so
    // c_k stays fixed, and the suppression self-join shuffles on cid
    // only — never all-pairs.
    Q(
      "dedup_semdedup",
      s"""WITH $vecsSqlCte,
         |c AS (SELECT vec_id AS cid, v AS cv FROM v WHERE vec_id BETWEEN 1 AND 16),
         |sc AS (SELECT v.vec_id, v.label, v.v, c.cid, ${cosineSql("v.v", "c.cv")} AS acos
         |       FROM v CROSS JOIN c),
         |m AS (SELECT vec_id, label, v, cid, acos FROM
         |        (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                      ORDER BY acos DESC, cid) AS rn FROM sc)
         |      WHERE rn = 1),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cid
         |                                   ORDER BY acos, vec_id) AS r FROM m)
         |SELECT x.vec_id, x.label, x.cid, round(x.acos, 6) AS centroid_sim
         |FROM r x LEFT JOIN r y ON y.cid = x.cid AND y.r < x.r
         |                      AND ${cosineSql("x.v", "y.v")} >= 0.3
         |WHERE y.vec_id IS NULL
         |ORDER BY x.vec_id""".stripMargin,
    ) { (s, d) =>
      // assignment as a projection over the broadcast pivoted centroid
      // array (ivfSorted); acos = −na is bit-exact (negation is an
      // involution on non-NaN doubles)
      val e = vecs(s, d)
      val centsArr = broadcast(centsArray(
        e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("cid"), col("v").as("cv")),
      ))
      val members = e.crossJoin(centsArr)
        .withColumn("best", element_at(ivfSorted("v"), 1))
        .select(
          col("vec_id"), col("label"), col("v"),
          col("best.cid").as("cid"), (-col("best.na")).as("acos"),
        )
      val wRank = Window.partitionBy("cid").orderBy(col("acos"), col("vec_id"))
      val ranked = members.withColumn("r", row_number().over(wRank))
      ranked.as("x")
        .join(
          ranked.as("y"),
          col("x.cid") === col("y.cid") && col("y.r") < col("x.r") &&
            cosine("x.v", "y.v") >= 0.3,
          "left_anti",
        )
        .select(col("vec_id"), col("label"), col("cid"), round(col("acos"), 6).as("centroid_sim"))
        .orderBy("vec_id")
    },

    // ----- embedding-space decontamination: the SEMANTIC complement of
    // text_decontaminate's n-gram screen. The eval set (vec_id < 20 —
    // standing in for benchmark embeddings) broadcasts; every corpus
    // vector records its max cosine against ANY eval member and is
    // flagged past tau=0.3. One embarrassingly-parallel corpus pass ×
    // |eval| broadcast rows, partial max aggregation — no shuffle of
    // the corpus side beyond the per-vector max combine; paraphrased
    // contamination that shares no 13-gram with the eval text is
    // exactly what this catches and the n-gram screen cannot.
    Q(
      "embedding_decontaminate",
      s"""WITH $vecsSqlCte,
         |ev AS (SELECT vec_id AS eid, v AS ev FROM v WHERE vec_id < 20),
         |sc AS (SELECT c.vec_id, c.label, ${cosineSql("c.v", "ev.ev")} AS sim
         |       FROM v c CROSS JOIN ev WHERE c.vec_id >= 20)
         |SELECT vec_id, label, round(max(sim), 6) AS eval_sim,
         |       max(sim) >= 0.3 AS contaminated
         |FROM sc GROUP BY vec_id, label ORDER BY vec_id""".stripMargin,
    ) { (s, d) =>
      // the eval set broadcasts as ONE array row; each corpus vector's
      // max-over-eval cosine is a projection (array_max over the same
      // per-pair cosine folds — max is order-insensitive and exact), so
      // the N×|eval| crossJoin fanout and the groupBy exchange both
      // disappear: one map-only corpus pass + the presentation sort
      val e = vecs(s, d)
      val ev = broadcast(e.where(col("vec_id") < 20).agg(collect_list(col("v")).as("evs")))
      e.where(col("vec_id") >= 20)
        .crossJoin(ev)
        .withColumn("msim", expr("array_max(transform(evs, ev -> cosine_similarity(v, ev)))"))
        .select(
          col("vec_id"), col("label"),
          round(col("msim"), 6).as("eval_sim"), (col("msim") >= 0.3).as("contaminated"),
        )
        .orderBy("vec_id")
    },

    // ----- index-routed decontamination: the scale path of the oracled
    // brute-force pass above. The corpus lives in an IvfStore; the eval
    // set probes nprobe clusters per vector (static partition filter),
    // so the screen reads a corpus SLICE, not the corpus. Approximate
    // in the standard ANN sense (flags ⊆ brute-force flags, exact
    // similarities, recall from nprobe — SemDedupSpec pins subset,
    // exactness, the recall floor, and nprobe=K ≡ brute force).
    Q.noOracle("embedding_decontaminate_indexed") { (s, d) =>
      val e = vecs(s, d)
      // cached per corpus fixture: the screen prices the probe, the
      // one-time build is laddered in AnnBench (VERDICT r13 #2)
      val path = StoreCache.resolve(d, "ivf-decon") { p =>
        graft.operators.IvfStore.build(
          e.where(col("vec_id") >= 20), p,
          nCentroids = 16, lloydIters = 1, seedIds = Some(20L to 35L),
        )
      }
      graft.operators.SemDedup
        .decontaminate(s, path, e.where(col("vec_id") < 20).select("vec_id", "label", "v"), tau = 0.3)
        .select(col("vec_id"), col("label"), round(col("eval_sim"), 6).as("eval_sim"))
        .orderBy("vec_id")
    },

    // ----- incremental SemDeDup over a persisted IVF store (the
    // BandsStore screen-and-absorb pattern for embeddings): the corpus
    // (vec_id >= 100) is indexed ONCE; the batch (vec_id < 100) is
    // screened at tau=0.3 against stored cluster members and
    // earlier-ranked batch-mates, reading only the batch's cluster
    // partitions. no_oracle like every index walk; SemDedupSpec pins
    // the exact suppression contract against a sequential reference,
    // the cross-batch absorb memory, and the partition-pruned scan.
    Q.noOracle("dedup_semdedup_cross") { (s, d) =>
      val e = vecs(s, d)
      // cached per corpus fixture: the screen (a read-only probe of the
      // stored clusters) prices the steady-state cost (VERDICT r13 #2)
      val path = StoreCache.resolve(d, "ivf-semdedup") { p =>
        graft.operators.IvfStore.build(
          e.where(col("vec_id") >= 100), p,
          nCentroids = 16, lloydIters = 1, seedIds = Some(100L to 115L),
        )
      }
      graft.operators.SemDedup.screenBatch(s, path, e.where(col("vec_id") < 100), tau = 0.3)
        .select(col("vec_id"), col("label"), col("cid"), round(col("acos"), 6).as("centroid_sim"))
        .orderBy("vec_id")
    },

    // ----- per-DIMENSION affine int8 quantization (the codebook form of
    // vector_quantize_int8's per-vector scale): each dimension gets its
    // own (min, scale) learned from the corpus — one posexplode +
    // groupBy(pos) pass (64 rows out, broadcast back), then a pure map.
    // Per-dim ranges cut reconstruction error vs one global scale when
    // dimensions have unequal spread, at zero extra scan cost; this is
    // the scalar-quantization half of product quantization
    // (vector_pq_codes below is the k-means-codebook half). floor() not round()
    // (round-half ties differ between engines; floor is exact IEEE);
    // max-error aggregate is exact (no float summation).
    Q(
      "vector_quantize_perdim",
      s"""WITH $vecsSqlCte,
         |u AS (SELECT vec_id, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM v),
         |st AS (SELECT pos, min(x) AS mn, (max(x) - min(x)) / 255 AS scale
         |       FROM u GROUP BY pos),
         |q AS (SELECT vec_id, u.pos, x, mn, scale,
         |             least(floor((x - mn) / scale), 255) AS code
         |      FROM u JOIN st ON u.pos = st.pos WHERE scale > 0)
         |SELECT vec_id,
         |       CAST(max(CASE WHEN pos = 1 THEN code END) AS INTEGER) AS q1,
         |       CAST(max(CASE WHEN pos = 2 THEN code END) AS INTEGER) AS q2,
         |       CAST(max(CASE WHEN pos = 3 THEN code END) AS INTEGER) AS q3,
         |       max(abs(x - (mn + (CAST(code AS DOUBLE) + 0.5) * scale))) AS max_err
         |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    ) { (s, d) =>
      val u = vecs(s, d).select(col("vec_id"), posexplode(col("v")).as(Seq("pos", "x")))
      val st = u.groupBy("pos")
        .agg(min("x").as("mn"), ((max("x") - min("x")) / 255).as("scale"))
      val q = u.join(broadcast(st), "pos")
        .where(col("scale") > 0)
        // Spark floor(DOUBLE) is BIGINT, DuckDB's stays DOUBLE — both
        // exact integers; CAST AS DOUBLE below unifies the arithmetic
        .withColumn("code", least(floor((col("x") - col("mn")) / col("scale")), lit(255L)))
      q.groupBy("vec_id")
        .agg(
          max(when(col("pos") === 0, col("code"))).cast("int").as("q1"),
          max(when(col("pos") === 1, col("code"))).cast("int").as("q2"),
          max(when(col("pos") === 2, col("code"))).cast("int").as("q3"),
          max(abs(col("x") - (col("mn") + (col("code").cast("double") + 0.5) * col("scale"))))
            .as("max_err"),
        )
        .orderBy("vec_id")
    },

    // ----- product-quantization codebook: train per-block codebooks and
    // emit every vector's code (its 4 nearest-centroid ids). No shuffle
    // before the final groupBy(vec_id); recentering shuffles only
    // M*K*16 = 512 mean cells. The error column is max-over-blocks
    // (order-invariant), NOT sum — summing 53-bit-mantissa squares is
    // accumulation-order-sensitive and Spark/DuckDB group in different
    // orders, while every individual d2 is a sequential fold, bit-exact
    // in both engines.
    Q(
      "vector_pq_codes",
      s"""WITH $vecsSqlCte,
         |$pqSqlCte
         |SELECT vec_id,
         |       CAST(max(CASE WHEN m = 0 THEN cid END) AS INTEGER) AS c0,
         |       CAST(max(CASE WHEN m = 1 THEN cid END) AS INTEGER) AS c1,
         |       CAST(max(CASE WHEN m = 2 THEN cid END) AS INTEGER) AS c2,
         |       CAST(max(CASE WHEN m = 3 THEN cid END) AS INTEGER) AS c3,
         |       round(max(d2), 6) AS max_block_err
         |FROM af GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    ) { (s, d) =>
      val blocks = pqBlocks(vecs(s, d))
      pqAssign(blocks, pqTrain(blocks))
        .groupBy("vec_id")
        .agg(
          max(when(col("m") === 0, col("cid"))).cast("int").as("c0"),
          max(when(col("m") === 1, col("cid"))).cast("int").as("c1"),
          max(when(col("m") === 2, col("cid"))).cast("int").as("c2"),
          max(when(col("m") === 3, col("cid"))).cast("int").as("c3"),
          round(max("d2"), 6).as("max_block_err"),
        )
        .orderBy("vec_id")
    },

    // ----- the 100-TB training shape: the codebook trains on a
    // deterministic 1-in-16 hash-sample (each Lloyd pass scans only the
    // sample — training cost is independent of corpus size), and only
    // the single assignment pass is full-corpus. Codebook quality
    // degrades gracefully with sample size (Jégou et al. train on
    // subsets for exactly this reason); correctness is unchanged
    // because assignment is still exact nearest-centroid.
    Q(
      "vector_pq_codes_sampled",
      s"""WITH $vecsSqlCte,
         |$pqSampledSqlCte
         |SELECT vec_id,
         |       CAST(max(CASE WHEN m = 0 THEN cid END) AS INTEGER) AS c0,
         |       CAST(max(CASE WHEN m = 1 THEN cid END) AS INTEGER) AS c1,
         |       CAST(max(CASE WHEN m = 2 THEN cid END) AS INTEGER) AS c2,
         |       CAST(max(CASE WHEN m = 3 THEN cid END) AS INTEGER) AS c3,
         |       round(max(d2), 6) AS max_block_err
         |FROM af GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    ) { (s, d) =>
      val blocks = pqBlocks(vecs(s, d))
      val sample = blocks.where(col("vec_id") % 16 === 1)
      pqAssign(blocks, pqTrainOn(sample, pqSampleSeedIds))
        .groupBy("vec_id")
        .agg(
          max(when(col("m") === 0, col("cid"))).cast("int").as("c0"),
          max(when(col("m") === 1, col("cid"))).cast("int").as("c1"),
          max(when(col("m") === 2, col("cid"))).cast("int").as("c2"),
          max(when(col("m") === 3, col("cid"))).cast("int").as("c3"),
          round(max("d2"), 6).as("max_block_err"),
        )
        .orderBy("vec_id")
    },

    // ----- PQ asymmetric-distance top-k: the search path PQ codes exist
    // for. The query vector never decodes the corpus — it builds a 32-row
    // lookup table (squared L2 from each of its 4 subvectors to each of
    // the 8 centroids of that block), broadcasts it, and every encoded
    // vector's approximate distance is 4 table lookups. At 100 TB the
    // corpus side carries only (vec_id, 4 codes) — the 64-dim floats are
    // never touched after encoding, which is the entire memory-bandwidth
    // argument for PQ. The 4 lookups sum in a FIXED expression tree
    // (a0+a1+a2+a3), not a float aggregate, so the total is
    // order-deterministic and the top-k cut identical in both engines;
    // the final orderBy().limit() plans TakeOrderedAndProject (bounded
    // per-partition heaps), never a global sort.
    Q(
      "vector_pq_topk",
      s"""WITH $vecsSqlCte,
         |$pqSqlCte,
         |lut AS (SELECT c.m, c.cid, ${l2sqSql("b.sv", "c.cv")} AS qd2
         |        FROM blk b JOIN cb2 c ON b.m = c.m WHERE b.vec_id = 0),
         |pp AS (SELECT a.vec_id,
         |              max(CASE WHEN a.m = 0 THEN l.qd2 END) AS a0,
         |              max(CASE WHEN a.m = 1 THEN l.qd2 END) AS a1,
         |              max(CASE WHEN a.m = 2 THEN l.qd2 END) AS a2,
         |              max(CASE WHEN a.m = 3 THEN l.qd2 END) AS a3
         |       FROM af a JOIN lut l ON a.m = l.m AND a.cid = l.cid
         |       GROUP BY a.vec_id)
         |SELECT p.vec_id, v.label, round(p.a0 + p.a1 + p.a2 + p.a3, 6) AS adc
         |FROM pp p JOIN v ON p.vec_id = v.vec_id
         |WHERE p.vec_id <> 0
         |ORDER BY (p.a0 + p.a1 + p.a2 + p.a3), p.vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      val e = vecs(s, d)
      val blocks = pqBlocks(e)
      // two consumers (assignment + lookup table), both via
      // broadcast(trained): the two broadcast exchanges are identical,
      // so exchange reuse runs the Lloyd chain once and shares the
      // 32-row broadcast — no cache to leave pinned behind
      val trained = pqTrain(blocks)
      val af = pqAssign(blocks, trained).select("vec_id", "m", "cid")
      val lut = blocks.where(col("vec_id") === 0)
        .join(broadcast(trained), "m")
        .select(col("m"), col("cid"), l2sq("sv", "cv").as("qd2"))
      af.join(broadcast(lut), Seq("m", "cid"))
        .groupBy("vec_id")
        .agg(
          max(when(col("m") === 0, col("qd2"))).as("a0"),
          max(when(col("m") === 1, col("qd2"))).as("a1"),
          max(when(col("m") === 2, col("qd2"))).as("a2"),
          max(when(col("m") === 3, col("qd2"))).as("a3"),
        )
        .where(col("vec_id") =!= 0)
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .withColumn("adc_raw", col("a0") + col("a1") + col("a2") + col("a3"))
        .orderBy(col("adc_raw"), col("vec_id"))
        .select(col("vec_id"), col("label"), round(col("adc_raw"), 6).as("adc"))
        .limit(5)
    },

    // ----- IVF-PQ composition: the standard production vector-search
    // pipeline. The coarse quantizer (ann_ivf's 16 seeded lists) prunes
    // the corpus to the query's nprobe=4 inverted lists; the PQ ADC scan
    // (vector_pq_topk's broadcast lookup table) then scores ONLY those
    // lists' members from their 8-bit codes — the two prunings multiply:
    // scan cost is |probed lists| × M table lookups, with neither raw
    // vectors nor unprobed codes touched. (Codes are trained on raw
    // subvectors, not residuals — IVFADC-without-residuals; the residual
    // refinement changes the codebook, not the plan shape.) At 100 TB
    // the codes+list_id table is the persisted index; everything
    // broadcast here (codebook, LUT, probe set) is O(K) rows.
    Q(
      "vector_ivfpq_topk",
      s"""WITH $vecsSqlCte,
         |c AS (SELECT vec_id AS ccid, v AS ccv FROM v WHERE vec_id BETWEEN 1 AND 16),
         |cscored AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                         ORDER BY acos DESC, ccid) AS crn FROM
         |             (SELECT v.vec_id, c.ccid, ${cosineSql("v.v", "c.ccv")} AS acos
         |              FROM v CROSS JOIN c)),
         |coarse AS (SELECT vec_id, ccid AS list_id FROM cscored WHERE crn = 1),
         |plist AS (SELECT ccid AS probed FROM cscored WHERE vec_id = 0 AND crn <= 4),
         |$pqSqlCte,
         |lut AS (SELECT c.m, c.cid, ${l2sqSql("b.sv", "c.cv")} AS qd2
         |        FROM blk b JOIN cb2 c ON b.m = c.m WHERE b.vec_id = 0),
         |pp AS (SELECT a.vec_id,
         |              max(CASE WHEN a.m = 0 THEN l.qd2 END) AS a0,
         |              max(CASE WHEN a.m = 1 THEN l.qd2 END) AS a1,
         |              max(CASE WHEN a.m = 2 THEN l.qd2 END) AS a2,
         |              max(CASE WHEN a.m = 3 THEN l.qd2 END) AS a3
         |       FROM af a
         |       JOIN coarse co ON co.vec_id = a.vec_id
         |       JOIN plist p ON co.list_id = p.probed
         |       JOIN lut l ON a.m = l.m AND a.cid = l.cid
         |       GROUP BY a.vec_id)
         |SELECT p.vec_id, v.label, round(p.a0 + p.a1 + p.a2 + p.a3, 6) AS adc
         |FROM pp p JOIN v ON p.vec_id = v.vec_id
         |WHERE p.vec_id <> 0
         |ORDER BY (p.a0 + p.a1 + p.a2 + p.a3), p.vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      // coarse assignment + probe list as projections over the broadcast
      // pivoted centroid array (ivfSorted — see ann_ivf_topk)
      val e = vecs(s, d)
      val centsArr = broadcast(centsArray(
        e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("cid"), col("v").as("cv")),
      ))
      val coarse = e.crossJoin(centsArr)
        .select(col("vec_id"), element_at(ivfSorted("v"), 1)("cid").as("list_id"))
      val plist = broadcast(
        e.where(col("vec_id") === 0).crossJoin(centsArr)
          .select(explode(expr(s"slice(${ivfSortedSql("v")}, 1, 4)")).as("p"))
          .select(col("p.cid").as("probed")),
      )
      val blocks = pqBlocks(e)
      val trained = pqTrain(blocks)
      val af = pqAssign(blocks, trained).select("vec_id", "m", "cid")
      val lut = blocks.where(col("vec_id") === 0)
        .join(broadcast(trained), "m")
        .select(col("m"), col("cid"), l2sq("sv", "cv").as("qd2"))
      af
        .join(coarse, "vec_id")
        .join(plist, col("list_id") === col("probed"))
        .join(broadcast(lut), Seq("m", "cid"))
        .groupBy("vec_id")
        .agg(
          max(when(col("m") === 0, col("qd2"))).as("a0"),
          max(when(col("m") === 1, col("qd2"))).as("a1"),
          max(when(col("m") === 2, col("qd2"))).as("a2"),
          max(when(col("m") === 3, col("qd2"))).as("a3"),
        )
        .where(col("vec_id") =!= 0)
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .withColumn("adc_raw", col("a0") + col("a1") + col("a2") + col("a3"))
        .orderBy(col("adc_raw"), col("vec_id"))
        .select(col("vec_id"), col("label"), round(col("adc_raw"), 6).as("adc"))
        .limit(5)
    },

    // ----- FULL IVFADC (Jégou et al. 2011): like vector_ivfpq_topk but
    // the PQ codebooks quantize RESIDUALS v − centroid(list(v)) — the
    // part of the vector the coarse quantizer didn't explain, which is
    // what makes the 8-bit codes spend their entropy where it matters.
    // The query side pays one LUT per PROBED list (its residual differs
    // per list): nprobe × M × K entries, still a broadcast-sized table.
    // Every stage is deterministic integer/fold arithmetic, so the
    // oracle replays the whole pipeline: coarse assign → residuals →
    // Lloyd on residual blocks → code assign → per-list LUT → ADC.
    Q(
      "vector_ivfpq_residual_topk",
      s"""WITH $vecsSqlCte,
         |c AS (SELECT vec_id AS ccid, v AS ccv FROM v WHERE vec_id BETWEEN 1 AND 16),
         |cscored AS (SELECT *, row_number() OVER (PARTITION BY vec_id
         |                                         ORDER BY acos DESC, ccid) AS crn FROM
         |             (SELECT v.vec_id, c.ccid, ${cosineSql("v.v", "c.ccv")} AS acos
         |              FROM v CROSS JOIN c)),
         |coarse AS (SELECT vec_id, ccid AS list_id FROM cscored WHERE crn = 1),
         |plist AS (SELECT ccid AS probed FROM cscored WHERE vec_id = 0 AND crn <= 4),
         |rv AS (SELECT v.vec_id, co.list_id,
         |              list_transform(list_zip(v.v, c.ccv), p -> p[1] - p[2]) AS rvv
         |       FROM v JOIN coarse co ON v.vec_id = co.vec_id
         |              JOIN c ON co.list_id = c.ccid),
         |rblk AS (SELECT vec_id, m, rvv[(m * 16 + 1):(m * 16 + 16)] AS sv
         |         FROM rv CROSS JOIN (SELECT unnest(range(4)) AS m)),
         |${pqSqlCteFor("rblk", "vec_id BETWEEN 17 AND 24", assignRel = "rblk")},
         |qr AS (SELECT p.probed AS list_id,
         |              list_transform(list_zip(q.qv, c.ccv), x -> x[1] - x[2]) AS rvv
         |       FROM plist p JOIN c ON p.probed = c.ccid
         |       CROSS JOIN (SELECT v AS qv FROM v WHERE vec_id = 0) q),
         |qrblk AS (SELECT list_id, m, rvv[(m * 16 + 1):(m * 16 + 16)] AS sv
         |          FROM qr CROSS JOIN (SELECT unnest(range(4)) AS m)),
         |lut AS (SELECT b.list_id, c.m, c.cid, ${l2sqSql("b.sv", "c.cv")} AS qd2
         |        FROM qrblk b JOIN cb2 c ON b.m = c.m),
         |pp AS (SELECT a.vec_id,
         |              max(CASE WHEN a.m = 0 THEN l.qd2 END) AS a0,
         |              max(CASE WHEN a.m = 1 THEN l.qd2 END) AS a1,
         |              max(CASE WHEN a.m = 2 THEN l.qd2 END) AS a2,
         |              max(CASE WHEN a.m = 3 THEN l.qd2 END) AS a3
         |       FROM af a
         |       JOIN coarse co ON co.vec_id = a.vec_id
         |       JOIN plist p ON co.list_id = p.probed
         |       JOIN lut l ON l.list_id = co.list_id AND a.m = l.m AND a.cid = l.cid
         |       GROUP BY a.vec_id)
         |SELECT p.vec_id, v.label, round(p.a0 + p.a1 + p.a2 + p.a3, 6) AS adc
         |FROM pp p JOIN v ON p.vec_id = v.vec_id
         |WHERE p.vec_id <> 0
         |ORDER BY (p.a0 + p.a1 + p.a2 + p.a3), p.vec_id LIMIT 5""".stripMargin,
    ) { (s, d) =>
      // coarse assignment + probe list as projections over the broadcast
      // pivoted centroid array (ivfSorted — see ann_ivf_topk); the plain
      // centroid rows stay broadcast for the residual joins below
      val e = vecs(s, d)
      val cents = broadcast(
        e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("ccid"), col("v").as("ccv")),
      )
      val centsArr = broadcast(centsArray(
        e.where(col("vec_id").between(1, 16)).select(col("vec_id").as("cid"), col("v").as("cv")),
      ))
      val coarse = e.crossJoin(centsArr)
        .select(col("vec_id"), element_at(ivfSorted("v"), 1)("cid").as("list_id"))
      val plist = broadcast(
        e.where(col("vec_id") === 0).crossJoin(centsArr)
          .select(explode(expr(s"slice(${ivfSortedSql("v")}, 1, 4)")).as("p"))
          .select(col("p.cid").as("probed")),
      )
      // residual vectors, then residual subvector blocks
      val rv = e.join(coarse, "vec_id")
        .join(cents, col("list_id") === col("ccid"))
        .select(col("vec_id"), col("list_id"), expr("zip_with(v, ccv, (x, y) -> x - y)").as("rvv"))
      val rblk = rv
        .select(
          col("vec_id"),
          explode(expr("transform(sequence(0, 3), m -> struct(m AS m, slice(rvv, m * 16 + 1, 16) AS sv))"))
            .as("b"),
        )
        .select(col("vec_id"), col("b.m").as("m"), col("b.sv").as("sv"))
      // seeds 17..24: vectors 1..16 ARE the coarse centroids, so their
      // residuals are ~zero and would collapse the seed codebook
      val trained = pqTrainOn(rblk, 17L to 24L)
      val af = pqAssign(rblk, trained).select("vec_id", "m", "cid")
      // query residual per PROBED list -> one LUT per list
      val q = broadcast(e.where(col("vec_id") === 0).select(col("v").as("qv")))
      val qrblk = plist
        .join(cents, col("probed") === col("ccid"))
        .crossJoin(q)
        .select(col("probed").as("list_id"), expr("zip_with(qv, ccv, (x, y) -> x - y)").as("rvv"))
        .select(
          col("list_id"),
          explode(expr("transform(sequence(0, 3), m -> struct(m AS m, slice(rvv, m * 16 + 1, 16) AS sv))"))
            .as("b"),
        )
        .select(col("list_id"), col("b.m").as("m"), col("b.sv").as("sv"))
      val lut = qrblk.join(broadcast(trained), "m")
        .select(col("list_id"), col("m"), col("cid"), l2sq("sv", "cv").as("qd2"))
      af
        .join(coarse, "vec_id")
        .join(plist, col("list_id") === col("probed"))
        .join(broadcast(lut), Seq("list_id", "m", "cid"))
        .groupBy("vec_id")
        .agg(
          max(when(col("m") === 0, col("qd2"))).as("a0"),
          max(when(col("m") === 1, col("qd2"))).as("a1"),
          max(when(col("m") === 2, col("qd2"))).as("a2"),
          max(when(col("m") === 3, col("qd2"))).as("a3"),
        )
        .where(col("vec_id") =!= 0)
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .withColumn("adc_raw", col("a0") + col("a1") + col("a2") + col("a3"))
        .orderBy(col("adc_raw"), col("vec_id"))
        .select(col("vec_id"), col("label"), round(col("adc_raw"), 6).as("adc"))
        .limit(5)
    },
  )
}
