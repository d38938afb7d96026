package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for an LLM training-data pipeline, over the
  * `documents` table:
  *   - exact dedup by content hash (hash-groupBy),
  *   - n-gram Jaccard via posting-list self-join (exact pairwise, scales
  *     as sum-of-squared posting sizes, not #docs²),
  *   - MinHash + LSH banding (the 100-TB-scale fuzzy-dedup path: cost is
  *     linear in corpus size; only docs sharing a band signature pair up),
  *   - SimHash fingerprinting.
  *
  * MinHash permutations: each shingle is digested ONCE (`md5`), a 32-bit
  * slice `h` is taken, and the 16 "permutations" are linear congruential
  * bijections `(aᵢ·h + bᵢ) mod 2³²` with odd aᵢ — true permutations of the
  * 32-bit space, pure integer arithmetic (16 mul/add/mod per shingle row
  * instead of 16 string digests), and reproduced bit-exactly by the DuckDB
  * oracle. No signed-64 overflow: aᵢ < 2³¹ and h < 2³² give aᵢ·h+bᵢ < 2⁶³.
  */
object DedupQueries {

  /** The 16 (aᵢ, bᵢ) affine constants, derived deterministically from
    * Knuth's multiplicative-hash constant so Spark columns and oracle SQL
    * literals can never drift apart. aᵢ is forced odd (bijectivity mod 2³²).
    */
  private[graft] val perms: Seq[(Long, Long)] = (1 to 16).map { i =>
    val a = ((2654435761L * i) % 2147483648L) | 1L
    val b = (2971215073L * i + 40503L * i * i) % 4294967296L
    (a, b)
  }

  /** 3-word shingles over a pre-split `w` array column, via the native
    * codegen [[graft.functions.WordShingles]] expression (one fused loop
    * inside WholeStageCodegen; the equivalent
    * `transform(sequence(…), i -> concat_ws(…))` lambda runs on the
    * interpreted HOF path — WordShinglesSpec pins exact parity).
    * Splitting once into `w` still matters: `split(text)` inlined per
    * element access would be O(words²) per document.
    */
  private def shingles(s: org.apache.spark.sql.SparkSession) = {
    graft.functions.GraftFunctions.register(s)
    expr("word_shingles(w, 3)")
  }

  /** Same shingling in DuckDB (1-based list indexing, end-exclusive range). */
  private val shinglesSqlCte =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |              unnest(list_transform(range(1, len(w) - 1),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
      |       FROM ws)""".stripMargin

  /** MinHash signatures + LSH banding in DuckDB, shared by the
    * dedup_minhash_lsh and dedup_clusters oracles so the candidate
    * graphs can never drift apart. Mirrors the Spark kernel exactly:
    * one md5 per shingle, 32-bit slice, 16 affine permutations.
    * Dedup happens on `h`, not the shingle string — a same-doc slice
    * collision merges identically on both engines, and min() is
    * multiset-invariant anyway.
    */
  private def minhashBandsSqlCte(rowsPerBand: Int): String = {
    val permValues = perms.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    s"""perm AS (SELECT * FROM (VALUES $permValues) t(seed, a, b)),
       |shh AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h FROM sh),
       |mh AS (SELECT doc_id, seed, min((a * h + b) % 4294967296) AS mh
       |       FROM shh CROSS JOIN perm
       |       GROUP BY doc_id, seed),
       |bands AS (SELECT doc_id, CAST(seed // $rowsPerBand AS INTEGER) AS band,
       |                 string_agg(CAST(mh AS VARCHAR), '|' ORDER BY seed) AS sig
       |          FROM mh GROUP BY doc_id, seed // $rowsPerBand)""".stripMargin
  }

  /** DuckDB mirror of [[simhashFp]], ending in `fp(doc_id, simhash)`.
    * Bit 63 cannot be built as `1 << 63` (DuckDB overflow-checks the
    * shift) nor summed in (BIGINT sum would overflow): bits 0–62 sum to
    * at most 2⁶³−1, and the sign bit is OR'd in as the explicit
    * `-2⁶³` literal — bitwise OR never overflows, and the resulting
    * two's-complement pattern is exactly what Spark's long arithmetic
    * produces.
    */
  private val simhashSqlCte =
    """t AS (SELECT doc_id, w, count(*) AS cnt
      |      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |      GROUP BY doc_id, w),
      |h AS (SELECT doc_id, cnt, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h_lo,
      |             ('0x' || substr(md5(w), 9, 8))::BIGINT AS h_hi FROM t),
      |bits AS (SELECT doc_id, j,
      |                CASE WHEN sum(cnt * (2 * (CASE WHEN j < 32 THEN (h_lo >> j) & 1
      |                                               ELSE (h_hi >> (j - 32)) & 1 END) - 1)) > 0
      |                     THEN 1 ELSE 0 END AS bit
      |         FROM h CROSS JOIN (SELECT unnest(range(64)) AS j)
      |         GROUP BY doc_id, j),
      |fp AS (SELECT doc_id,
      |              CAST(sum(CASE WHEN j < 63 THEN bit * (1::BIGINT << j) ELSE 0 END) AS BIGINT) |
      |              (CASE WHEN max(CASE WHEN j = 63 THEN bit ELSE 0 END) = 1
      |                      THEN (-9223372036854775807 - 1) ELSE 0 END) AS simhash
      |       FROM bits GROUP BY doc_id)""".stripMargin

  /** MinHash+LSH candidate pairs (doc_a < doc_b). One shuffle: the 16
    * per-seed min-hashes are 16 aggregate columns of a single groupBy
    * (not a 16x crossJoin + two extra shuffles); bands then unpivot via
    * stack. The kernel digests each shingle ONCE (md5 → 32-bit slice),
    * then derives the 16 permutations as affine maps — ~16× less digest
    * work than hashing (seed, shingle) pairs, and the shingle string is
    * dropped before the shuffle (8-byte h instead of ~24-byte text).
    * Values are identical to the oracle's cross-join formulation.
    */
  private[graft] def minhashPairs(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      rowsPerBand: Int = 4,
  ): org.apache.spark.sql.DataFrame =
    minhashPairsOf(s, Tables.fanout(Tables.documents(s, d)), rowsPerBand)

  /** [[minhashPairs]] over an arbitrary (doc_id, text) frame — the same
    * kernel, parameterized for witness specs that need synthetic corpora.
    */
  private[graft] def minhashPairsOf(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      rowsPerBand: Int = 4,
  ): org.apache.spark.sql.DataFrame =
    pairsFromBands(minhashBands(s, docs, rowsPerBand))

  /** The LSH candidate self-join over any banding table (doc_id, band,
    * sig) — factored out so the set-derived banding of [[setsWithBands]]
    * feeds the identical join.
    */
  private def pairsFromBands(bands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bands.as("x")
      .join(
        bands.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"),
      )
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()

  /** (sets, bands) for the verify/containment/cross family, both derived
    * from ONE collect_set aggregation (r21): those queries materialize
    * the full distinct-shingle sets regardless (their exact-overlap
    * scoring needs them), and min is multiset-invariant, so the MinHash
    * signature computes FROM the set as a post-aggregation projection —
    * the compiled [[graft.functions.MinHashSigs]] kernel, pinned
    * band-for-band against [[minhashBands]] by MinHashSigsSpec. Against
    * the two-pipeline shape this removes one whole corpus scan + explode
    * + md5 pass AND the separate 16-longs-per-doc bands exchange; the
    * one corpus exchange left is the collect_set the queries already
    * paid. Every consumer (the band self-join's two sides and the
    * scoring joins' two set sides) prunes the SAME single-aggregate
    * groupBy, so the canonical subtrees stay equal and adaptive stage
    * reuse materializes the exchange once. The bands-ONLY queries (lsh,
    * clusters, cluster_rep, …) deliberately keep [[minhashBands]]: for
    * them collect_set would shuffle the shingle payload their 16-long
    * signatures avoid.
    */
  private def setsWithBands(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      rowsPerBand: Int = 4,
  ): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val nBands = 16 / rowsPerBand
    val sets = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(shingles(s)).as("sh"))
      .groupBy("doc_id").agg(collect_set("sh").as("ss"))
    val sigs = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.MinHashSigs(
        org.apache.spark.sql.graft.ColumnBridge.expression(col("ss")),
        perms.map(_._1).toArray,
        perms.map(_._2).toArray,
      ),
    )
    // alias the signature array FIRST so the 16 element_at's reference
    // one evaluation (CollapseProject keeps a non-cheap alias un-inlined)
    val mh = sets.select(col("doc_id"), sigs.as("mh"))
    val withBands = mh.select(
      col("doc_id") +: (0 until nBands).map(b =>
        concat_ws("|", (b * rowsPerBand until (b + 1) * rowsPerBand)
          .map(i => element_at(col("mh"), i + 1)): _*).as(s"band$b"),
      ): _*,
    )
    val bands = withBands.select(
      col("doc_id"),
      expr(s"stack($nBands, ${(0 until nBands).map(b => s"$b, band$b").mkString(", ")}) AS (band, sig)"),
    )
    (sets, bands)
  }

  /** LSH banding table (doc_id, band, sig) for an arbitrary (doc_id,
    * text) frame — the shared front half of every MinHash pipeline: one
    * md5 per distinct shingle, 16 affine permutations as aggregate
    * columns of a single groupBy, bands unpivoted via stack.
    */
  private[graft] def minhashBands(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      rowsPerBand: Int = 4,
  ): org.apache.spark.sql.DataFrame = {
    val nBands = 16 / rowsPerBand
    // NO distinct before the min aggregation: min is multiset-invariant
    // (a duplicate (doc_id, h) cannot change any per-seed minimum), so
    // the distinct the oracle spells out (shh) is a pure no-op here —
    // and as a plan node it cost a full corpus-wide exchange of the
    // widest table in the pipeline AND blocked map-side partial
    // aggregation of the groupBy below (with it, ~|shingles| rows
    // crossed the wire twice; without it, only per-partition partial
    // min states do). Values are unchanged at any scale.
    val sh = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3) // <3 words -> no shingles; prune before the explode
      .select(col("doc_id"), explode(shingles(s)).as("sh"))
      .select(col("doc_id"), expr("CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT)").as("h"))
    val mhAggs = perms.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * lit(a) + lit(b)) % lit(4294967296L)).as(s"mh$i")
    }
    val sigs = sh.groupBy("doc_id").agg(mhAggs.head, mhAggs.tail: _*)
    val withBands = sigs.select(
      col("doc_id") +: (0 until nBands).map(b =>
        concat_ws("|", (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh$i")): _*)
          .as(s"band$b"),
      ): _*,
    )
    withBands.select(
      col("doc_id"),
      expr(s"stack($nBands, ${(0 until nBands).map(b => s"$b, band$b").mkString(", ")}) AS (band, sig)"),
    )
  }

  /** Un-thresholded similarity components for every LSH candidate pair of
    * an arbitrary (doc_id, text) frame: (doc_a, doc_b, n_inter, n_a, n_b).
    * Witness-spec surface — the registered queries derive jaccard /
    * containment from exactly these integers, so invariants proven here
    * (containment ≥ jaccard, subset ⇒ containment = 1) transfer to them.
    */
  private[graft] def scorePairs(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame =
    scoreWith(s, docs, minhashPairsOf(s, docs))

  /** Like [[scorePairs]] but over ALL doc pairs, not just LSH candidates
    * — for witnesses about the scoring math itself (e.g. a subset pair
    * that banding is free to miss must still score containment = 1).
    * Quadratic; synthetic-corpus use only.
    */
  private[graft] def scoreAllPairs(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame = {
    val ids = docs.select("doc_id")
    val pairs = ids.as("x")
      .join(ids.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    scoreWith(s, docs, pairs)
  }

  private def scoreWith(
      s: org.apache.spark.sql.SparkSession,
      docs: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame,
  ): org.apache.spark.sql.DataFrame = {
    val shRows = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .where(size(col("w")) >= 3)
      .select(col("doc_id"), explode(shingles(s)).as("sh"))
    val sets = shRows.groupBy("doc_id").agg(collect_set("sh").as("ss"))
    pairs
      .join(sets.as("a"), col("doc_a") === col("a.doc_id"))
      .join(sets.as("b"), col("doc_b") === col("b.doc_id"))
      .select(
        col("doc_a"),
        col("doc_b"),
        size(array_intersect(col("a.ss"), col("b.ss"))).as("n_inter"),
        size(col("a.ss")).as("n_a"),
        size(col("b.ss")).as("n_b"),
      )
  }

  /** The keep-best cluster-representative semantics in DuckDB — shared
    * by `dedup_cluster_rep` (one-shot) and `dedup_cluster_rep_inc` (the
    * [[graft.operators.ClusterRepStore]] incremental form): the final
    * folded store state over any batch history IS the one-shot answer
    * on the unioned corpus, so one oracle certifies both.
    */
  private def clusterRepSqlWhere(where: String): String =
    s"""WITH RECURSIVE $shinglesSqlCte,
       |${minhashBandsSqlCte(4)},
       |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
       |          FROM bands x JOIN bands y
       |            ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
       |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
       |      UNION SELECT doc_b, doc_a FROM pairs),
       |reach(node, r) AS (
       |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN e ON reach.node = e.a),
       |comp AS (SELECT node AS doc_id, min(r) AS cl FROM reach GROUP BY node)
       |SELECT d.doc_id,
       |       CAST(coalesce(c.cl, d.doc_id) AS BIGINT) AS cluster,
       |       CAST(CASE WHEN row_number() OVER (
       |                        PARTITION BY coalesce(c.cl, d.doc_id)
       |                        ORDER BY d.n_chars DESC, d.doc_id) = 1
       |                 THEN 1 ELSE 0 END AS INTEGER) AS keep
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id$where
       |ORDER BY d.doc_id""".stripMargin

  private lazy val clusterRepSql = clusterRepSqlWhere("")

  val qs: Seq[Q] = Seq(

    // ----- exact dedup by content hash; min doc_id is the keeper
    Q(
      "dedup_exact_docs",
      """SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keeper,
        |       count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keeper""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
        .orderBy("keeper")
    },

    // ----- exact pairwise n-gram Jaccard via posting-list join
    Q(
      "dedup_ngram_jaccard",
      s"""WITH $shinglesSqlCte,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b,
         |       CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.02
         |ORDER BY doc_a, doc_b""".stripMargin,
    ) { (s, d) =>
      val sh = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 3) // <3 words -> no shingles; prune before the explode
        .select(col("doc_id"), explode(shingles(s)).as("sh"))
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a")
        .join(sh.as("b"), col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("ni"))
      val jac = col("ni").cast("double") / (col("sa.n") + col("sb.n") - col("ni"))
      inter
        .join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
        .where(jac >= 0.02)
        .select(col("doc_a"), col("doc_b"), jac.as("jaccard"))
        .orderBy("doc_a", "doc_b")
    },

    // ----- frequency-capped n-gram Jaccard: the 100-TB form of the
    // pairwise query above. Stop-shingles (document frequency > cap)
    // are dropped BEFORE the self-join, bounding the Σ|posting|² blowup;
    // sizes still count all shingles so the Jaccard denominator is
    // unchanged — the cap only prunes which pairs can surface.
    Q(
      "dedup_ngram_jaccard_capped",
      s"""WITH $shinglesSqlCte,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |rare AS (SELECT sh FROM (SELECT sh, count(*) AS df FROM sh GROUP BY sh)
         |         WHERE df <= 150),
         |shr AS (SELECT sh.doc_id, sh.sh FROM sh JOIN rare USING (sh)),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ni
         |          FROM shr a JOIN shr b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |          GROUP BY a.doc_id, b.doc_id)
         |SELECT doc_a, doc_b,
         |       CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) AS jaccard_lb
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(ni AS DOUBLE) / (sa.n + sb.n - ni) >= 0.02
         |ORDER BY doc_a, doc_b""".stripMargin,
    ) { (s, d) =>
      // explicit isnotnull on BOTH columns below the distinct (r21): the
      // posting self-join pushes isnotnull(sh) AND isnotnull(doc_id)
      // into its copies of this pipeline, `sizes` gets only the doc_id
      // one and `rare` only the sh one — three canonically different
      // subtrees, so AQE stage reuse never fired and the explode+distinct
      // pipeline (the dominant stage) executed twice per run (measured:
      // 2 × ~0.6–1.0 s 32-task stages). Neither column is ever null
      // (md5/explode of non-null text), so values are unchanged; with
      // the shared pre-filter every consumer replays ONE materialization.
      val sh = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 3) // <3 words -> no shingles; prune before the explode
        .select(col("doc_id"), explode(shingles(s)).as("sh"))
        .where(col("doc_id").isNotNull && col("sh").isNotNull)
        .distinct()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val rare = sh.groupBy("sh").agg(count(lit(1)).as("df")).where(col("df") <= 150).select("sh")
      val shr = sh.join(rare, "sh")
      // r22 (the graph_triangles rewrite, same shape): per-shingle pair
      // generation is a groupBy(sh) + collect_set + map-side double
      // explode, not a posting self-join. The join shuffled shr twice
      // (both sides, AQE-reused to one materialization but still a join
      // over the quadratic pair stream); collect_set rides the SAME
      // sh-partitioning the rare join just established (no new
      // exchange), and the pairs fan out AFTER the shuffle as projection
      // work. The rare pre-filter stays BELOW the aggregation on
      // purpose: it bounds every posting array at 150 doc_ids, so no
      // stop-shingle ever materializes as a giant in-memory row — the
      // cap that makes this the 100-TB form also makes the array form
      // safe. Values: shr rows are distinct (doc_id, sh), so the
      // per-shingle doc_id set is exactly the posting list, and
      // exploding all (a, b) with a < b enumerates exactly the pairs
      // the `a.doc_id < b.doc_id` self-join produced — same multiset
      // into the same (doc_a, doc_b) count.
      val posts = shr.groupBy("sh").agg(collect_set(col("doc_id")).as("ds"))
      val inter = posts
        .select(explode(col("ds")).as("doc_a"), col("ds"))
        .select(col("doc_a"), explode(col("ds")).as("doc_b"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("ni"))
      val jac = col("ni").cast("double") / (col("sa.n") + col("sb.n") - col("ni"))
      inter
        .join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
        .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
        .where(jac >= 0.02)
        .select(col("doc_a"), col("doc_b"), jac.as("jaccard_lb"))
        .orderBy("doc_a", "doc_b")
    },

    // ----- MinHash (16 hashes) + LSH banding (4 bands × 4 rows): candidate
    // pairs = docs agreeing on at least one full band signature
    Q(
      "dedup_minhash_lsh",
      s"""WITH $shinglesSqlCte,
         |${minhashBandsSqlCte(4)}
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    ) { (s, d) =>
      minhashPairs(s, d).orderBy("doc_a", "doc_b")
    },

    // ----- the banding recall/cost dial: same 16 minhashes cut as
    // 8 bands × 2 rows. Agreement on any 2-row band is far likelier than
    // on a 4-row band, so the candidate set is a superset at higher
    // join cost — the S-curve steers: b×r trades recall threshold
    // (≈ (1/b)^(1/r)) against candidate volume, per-corpus, without
    // touching the signature pass (one groupBy either way).
    Q(
      "dedup_minhash_lsh_wide",
      s"""WITH $shinglesSqlCte,
         |${minhashBandsSqlCte(2)}
         |SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |FROM bands x JOIN bands y
         |  ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
         |ORDER BY doc_a, doc_b""".stripMargin,
    ) { (s, d) =>
      minhashPairs(s, d, rowsPerBand = 2).orderBy("doc_a", "doc_b")
    },

    // ----- bloom-guarded incremental dedup: build a bloom filter over
    // the HISTORY corpus once (one aggregation, ~100 KB of bits), then
    // screen an incoming batch against it with a scalar-subquery
    // broadcast — no join against history at all. might_contain=false
    // is a PROOF the doc is new (blooms have no false negatives);
    // =true sends the doc to an exact check. At 100 TB this is the
    // difference between joining every new batch against the full
    // corpus and touching history once per epoch. Exposed via
    // GraftFunctions registering Spark's optimizer-internal
    // BloomFilterAggregate/BloomFilterMightContain as SQL functions.
    // Bloom bit patterns are engine-specific -> rows-only check;
    // SketchWitnessSpec pins the no-false-negative guarantee and a
    // sane false-positive rate against the exact anti-join witness
    // (n_truly_new, computed in-row).
    Q.noOracle("dedup_bloom_guard") { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      Q.withTempViews(s)("docs_bloom_guard" -> Tables.documents(s, d)) {
        s.sql(
          """WITH hist AS (SELECT text FROM docs_bloom_guard WHERE doc_id % 10 != 7),
            |batch AS (SELECT doc_id, text FROM docs_bloom_guard WHERE doc_id % 10 = 7),
            |bf AS (SELECT bloom_filter_agg(xxhash64(text), 100000L, 800000L) AS b FROM hist)
            |SELECT
            |  (SELECT count(*) FROM batch) AS n_batch,
            |  (SELECT count_if(NOT bloom_might_contain((SELECT b FROM bf), xxhash64(text)))
            |   FROM batch) AS n_definitely_new,
            |  (SELECT count(*) FROM batch
            |   WHERE text NOT IN (SELECT text FROM hist)) AS n_truly_new""".stripMargin,
        )
      }
    },

    // ----- two-stage fuzzy dedup, the standard production pipeline:
    // LSH proposes candidates (cheap, linear, with false positives),
    // then an exact-Jaccard pass over the candidates' shingle sets
    // keeps only true near-dups. At 100 TB the verification join
    // touches ONLY candidate pairs — |pairs| << |docs|² — so the
    // expensive exact measure is paid where banding says it matters.
    // Integer intersection/union sizes + one IEEE division keep the
    // jaccard doubles bit-identical across engines.
    Q(
      "dedup_minhash_verify",
      s"""WITH $shinglesSqlCte,
         |${minhashBandsSqlCte(4)},
         |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM bands x JOIN bands y
         |            ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS ss FROM sh GROUP BY doc_id),
         |scored AS (
         |  SELECT p.doc_a, p.doc_b,
         |         len(list_filter(a.ss, x -> list_contains(b.ss, x))) AS n_inter,
         |         len(a.ss) + len(b.ss) AS n_sum
         |  FROM pairs p
         |  JOIN sets a ON a.doc_id = p.doc_a
         |  JOIN sets b ON b.doc_id = p.doc_b)
         |SELECT doc_a, doc_b,
         |       CAST(n_inter AS DOUBLE) / (n_sum - n_inter) AS jaccard
         |FROM scored
         |WHERE CAST(n_inter AS DOUBLE) / (n_sum - n_inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    ) { (s, d) =>
      // r21: sets AND bands from ONE collect_set aggregation (see
      // setsWithBands — one corpus pass instead of two, values pinned)
      val (sets, bands) = setsWithBands(s, Tables.fanout(Tables.documents(s, d)))
      val nInter = size(array_intersect(col("a.ss"), col("b.ss")))
      val jaccard = nInter.cast("double") / (size(col("a.ss")) + size(col("b.ss")) - nInter)
      pairsFromBands(bands)
        .join(sets.as("a"), col("doc_a") === col("a.doc_id"))
        .join(sets.as("b"), col("doc_b") === col("b.doc_id"))
        .select(col("doc_a"), col("doc_b"), jaccard.as("jaccard"))
        .where(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // ----- asymmetric containment over the same LSH candidates: score
    // |A∩B| / min(|A|,|B|) (the overlap coefficient) instead of Jaccard.
    // Containment is what catches QUOTE/SUBSET duplication — a short doc
    // wholly embedded in a long one has Jaccard ≈ |A|/|B| (arbitrarily
    // low) but containment 1.0. Candidates still come from MinHash LSH,
    // which recalls by Jaccard — honest limitation: a high-containment /
    // low-Jaccard pair can be missed at the banding stage; the exhaustive
    // path for those is dedup_substring_spans. The threshold compares in
    // exact integer arithmetic (10·n_inter ≥ 6·n_min) so no float edge
    // exists at the cut; the reported ratio is an exact-integer-derived
    // double, bit-identical in both engines.
    Q(
      "dedup_minhash_containment",
      s"""WITH $shinglesSqlCte,
         |${minhashBandsSqlCte(4)},
         |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM bands x JOIN bands y
         |            ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS ss FROM sh GROUP BY doc_id),
         |scored AS (
         |  SELECT p.doc_a, p.doc_b,
         |         len(list_filter(a.ss, x -> list_contains(b.ss, x))) AS n_inter,
         |         least(len(a.ss), len(b.ss)) AS n_min
         |  FROM pairs p
         |  JOIN sets a ON a.doc_id = p.doc_a
         |  JOIN sets b ON b.doc_id = p.doc_b)
         |SELECT doc_a, doc_b,
         |       CAST(n_inter AS DOUBLE) / n_min AS containment
         |FROM scored
         |WHERE 10 * n_inter >= 6 * n_min
         |ORDER BY doc_a, doc_b""".stripMargin,
    ) { (s, d) =>
      // r21: sets AND bands from ONE collect_set aggregation (see
      // setsWithBands — one corpus pass instead of two, values pinned)
      val (sets, bands) = setsWithBands(s, Tables.fanout(Tables.documents(s, d)))
      val nInter = size(array_intersect(col("a.ss"), col("b.ss")))
      val nMin = least(size(col("a.ss")), size(col("b.ss")))
      pairsFromBands(bands)
        .join(sets.as("a"), col("doc_a") === col("a.doc_id"))
        .join(sets.as("b"), col("doc_b") === col("b.doc_id"))
        .select(col("doc_a"), col("doc_b"), nInter.as("n_inter"), nMin.as("n_min"))
        .where(lit(10) * col("n_inter") >= lit(6) * col("n_min"))
        .select(col("doc_a"), col("doc_b"), (col("n_inter").cast("double") / col("n_min")).as("containment"))
        .orderBy("doc_a", "doc_b")
    },

    // ----- cross-corpus fuzzy dedup: a NEW batch (odd sources) screened
    // against an existing corpus (even sources) — the new-crawl-versus-
    // training-set shape, where a self-join would waste candidates on
    // batch×batch and history×history pairs. One shingle/minhash pass
    // over BOTH corpora (cheaper than two pipelines), then the band join
    // pairs only across sides; exact-Jaccard verification touches only
    // the cross candidates. Threshold in integer arithmetic
    // (jaccard ≥ 0.5 ⇔ 3·n_inter ≥ n_sum); at 100 TB the history side's
    // bands are precomputed once and the per-batch cost is the batch's
    // own pipeline plus the band join.
    Q(
      "dedup_minhash_cross",
      s"""WITH $shinglesSqlCte,
         |${minhashBandsSqlCte(4)},
         |side AS (SELECT doc_id, CAST(substr(source, 4) AS INTEGER) % 2 AS parity FROM documents),
         |pairs AS (SELECT DISTINCT x.doc_id AS new_doc, y.doc_id AS old_doc
         |          FROM bands x JOIN side sx ON sx.doc_id = x.doc_id AND sx.parity = 1
         |          JOIN bands y ON x.band = y.band AND x.sig = y.sig
         |          JOIN side sy ON sy.doc_id = y.doc_id AND sy.parity = 0),
         |sets AS (SELECT doc_id, list(DISTINCT sh) AS ss FROM sh GROUP BY doc_id),
         |scored AS (
         |  SELECT p.new_doc, p.old_doc,
         |         len(list_filter(a.ss, t -> list_contains(b.ss, t))) AS ni,
         |         len(a.ss) + len(b.ss) AS ns
         |  FROM pairs p
         |  JOIN sets a ON a.doc_id = p.new_doc
         |  JOIN sets b ON b.doc_id = p.old_doc)
         |SELECT new_doc, old_doc, CAST(ni AS DOUBLE) / (ns - ni) AS jaccard
         |FROM scored WHERE 3 * ni >= ns
         |ORDER BY new_doc, old_doc""".stripMargin,
    ) { (s, d) =>
      // r21: sets AND bands from ONE collect_set aggregation (see
      // setsWithBands — one corpus pass instead of two, values pinned)
      val docs = Tables.fanout(Tables.documents(s, d))
      val (sets, bands) = setsWithBands(s, docs)
      val side = Tables.documents(s, d)
        // substring with no length (suffix to end-of-string) mirrors the
        // oracle's substr(source, 4) exactly — a fixed length would
        // truncate 5+ digit suffixes and could flip the parity.
        .select(col("doc_id"), (expr("CAST(substring(source, 4) AS INT)") % 2).as("parity"))
      val newB = bands.join(side.where(col("parity") === 1).drop("parity"), "doc_id")
      val oldB = bands.join(side.where(col("parity") === 0).drop("parity"), "doc_id")
      val pairs = newB.as("x")
        .join(oldB.as("y"), col("x.band") === col("y.band") && col("x.sig") === col("y.sig"))
        .select(col("x.doc_id").as("new_doc"), col("y.doc_id").as("old_doc"))
        .distinct()
      val ni = size(array_intersect(col("a.ss"), col("b.ss")))
      val ns = size(col("a.ss")) + size(col("b.ss"))
      pairs
        .join(sets.as("a"), col("new_doc") === col("a.doc_id"))
        .join(sets.as("b"), col("old_doc") === col("b.doc_id"))
        .select(col("new_doc"), col("old_doc"), ni.as("ni"), ns.as("ns"))
        .where(lit(3) * col("ni") >= col("ns"))
        .select(col("new_doc"), col("old_doc"), (col("ni").cast("double") / (col("ns") - col("ni"))).as("jaccard"))
        .orderBy("new_doc", "old_doc")
    },

    // ----- near-duplicate clusters: connected components over the LSH
    // candidate-pair graph, each doc labeled with the min doc_id of its
    // component (the canonical "keeper"). Spark side is iterative
    // min-label propagation — the standard scalable pattern (each round
    // is one join+groupBy; rounds ~ graph diameter); the oracle is a
    // recursive-CTE transitive closure, tractable at oracle scale.
    Q(
      "dedup_clusters",
      s"""WITH RECURSIVE $shinglesSqlCte,
         |${minhashBandsSqlCte(4)},
         |pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
         |          FROM bands x JOIN bands y
         |            ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
         |e AS (SELECT doc_a AS a, doc_b AS b FROM pairs
         |      UNION SELECT doc_b, doc_a FROM pairs),
         |reach(node, r) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
         |  UNION
         |  SELECT e.b, reach.r FROM reach JOIN e ON reach.node = e.a)
         |SELECT node AS doc_id, CAST(min(r) AS BIGINT) AS cluster
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      // Adaptive driver-local/distributed branching + lineage-cut label
      // propagation live in [[graft.operators.ConnectedComponents]];
      // both branches are pinned equal by ConnectedComponentsSpec.
      val pairs = minhashPairs(s, d).select(col("doc_a").as("a"), col("doc_b").as("b"))
      graft.operators.ConnectedComponents.minLabel(pairs)
        .select(col("node").as("doc_id"), col("label").as("cluster"))
        .orderBy("doc_id")
    },

    // ----- cluster-representative selection (the RefinedWeb/CCNet
    // keep-best step): near-dup clusters keep ONE representative — the
    // highest-QUALITY member (longest doc, doc_id tiebreak), not the
    // min-id canonical. Same LSH candidate graph + min-label components
    // as dedup_clusters; singleton docs (in no candidate pair) are their
    // own cluster and always kept. The rep choice is one window rank
    // over cluster — component-output-scale, dwarfed by the label
    // propagation — and the keep flag is the pipeline's downstream
    // filter: a semi-join on keep=1 drops every duplicate while
    // retaining the best copy instead of an arbitrary one.
    Q(
      "dedup_cluster_rep",
      clusterRepSql,
    ) { (s, d) =>
      val pairs = minhashPairs(s, d).select(col("doc_a").as("a"), col("doc_b").as("b"))
      val comp = graft.operators.ConnectedComponents.minLabel(pairs)
        .select(col("node").as("doc_id"), col("label"))
      val wRep = Window.partitionBy("cluster").orderBy(desc("n_chars"), col("doc_id"))
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), col("n_chars"))
        .join(comp, Seq("doc_id"), "left")
        .withColumn("cluster", coalesce(col("label"), col("doc_id")))
        .withColumn("keep", when(row_number().over(wRep) === 1, 1).otherwise(0))
        .select(col("doc_id"), col("cluster"), col("keep"))
        .orderBy("doc_id")
    },

    // ----- SimHash: 64-bit fingerprint from token-frequency-weighted bit votes
    Q(
      "dedup_simhash",
      s"""WITH $simhashSqlCte
         |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      simhashFp(s, d).orderBy("doc_id")
    },

    // ----- SimHash near-duplicate counts: Hamming-distance pairing over
    // the fingerprints. Pigeonhole banding makes it shuffle-bounded: the
    // 64 bits split into four 16-bit bands, and any pair within Hamming
    // distance 3 agrees exactly on at least one band (3 differing bits
    // can dirty at most 3 of the 4 bands) — so candidates only form
    // inside equal-band buckets, never all-pairs. 16-bit bands give
    // 65 536 bucket values each, so buckets stay O(1)-sized until the
    // corpus dwarfs the band space; the bucket-frequency cap (like the
    // capped Jaccard’s stop-shingle cap) bounds the Σ|bucket|² blowup a
    // degenerate corpus would still cause. Output is per-doc near-dup
    // counts, not pairs — near-dup clusters are quadratic in the clique
    // size and belong in aggregate form. Band keys extract as
    // `(simhash >> 16·b) & 65535`: the mask makes arithmetic shift of a
    // sign-bit-set fingerprint logical, identically in both engines.
    Q(
      "dedup_simhash_pairs",
      s"""WITH $simhashSqlCte,
         |bands AS (SELECT doc_id, simhash, band, (simhash >> (16 * band)) & 65535 AS key
         |          FROM fp CROSS JOIN (SELECT unnest(range(4)) AS band)),
         |ok AS (SELECT band, key FROM (SELECT band, key, count(*) AS df FROM bands
         |                              GROUP BY band, key) WHERE df <= 500),
         |bb AS (SELECT b.* FROM bands b JOIN ok USING (band, key)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa,
         |                         b.doc_id AS doc_b, b.simhash AS sb
         |         FROM bb a JOIN bb b
         |           ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
         |near AS (SELECT doc_a, doc_b FROM cand WHERE bit_count(xor(sa, sb)) <= 3),
         |e AS (SELECT doc_a AS d FROM near UNION ALL SELECT doc_b FROM near)
         |SELECT d AS doc_id, count(*) AS n_near FROM e GROUP BY d ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      // materialization barrier: the fingerprint table (ONE row per doc)
      // feeds both sides of the band self-join plus the bucket-cap —
      // without a barrier the whole token->votes pipeline executes three
      // times (its own groupBy exchange can't be reused across the
      // broadcast/shuffle consumer split). The repartition exchange IS
      // identical under every consumer, so exchange reuse computes the
      // votes once and each consumer replays ~20 B/doc of shuffle data —
      // the effect of the .cache() this replaces, minus the pinned-RDD
      // leak (this plan is lazy, so a cache would outlive the query).
      val fp = simhashFp(s, d).repartition(col("doc_id"))
      val bandExprs = (0 until 4).flatMap(b => Seq(s"$b", s"(simhash >> ${16 * b}) & 65535"))
      val bands = fp.select(
        col("doc_id"), col("simhash"),
        expr(s"stack(4, ${bandExprs.mkString(", ")}) AS (band, key)"),
      )
      val ok = bands.groupBy("band", "key").agg(count(lit(1)).as("df"))
        .where(col("df") <= 500).select("band", "key")
      val bb = bands.join(ok, Seq("band", "key"))
      // Hamming filter BEFORE the pair-dedup shuffle: bit_count is a few
      // instructions, the distinct is a shuffle — cutting the candidate
      // stream first shrinks the exchange ~10x (a near pair can match in
      // up to 4 band buckets, so the distinct on (doc_a, doc_b) still runs)
      val near = bb.as("a")
        .join(
          bb.as("b"),
          col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
            col("a.doc_id") < col("b.doc_id"),
        )
        .where(expr("bit_count(a.simhash ^ b.simhash) <= 3"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      near.select(col("doc_a").as("d"))
        .unionAll(near.select(col("doc_b").as("d")))
        .groupBy("d")
        .agg(count(lit(1)).as("n_near"))
        .select(col("d").as("doc_id"), col("n_near"))
        .orderBy("doc_id")
    },

    // ----- exact substring-span deduplication (Lee et al. 2022,
    // "Deduplicating Training Data Makes Language Models Better"): find
    // every k-gram (k=5 words) that occurs more than once in the corpus,
    // then merge each doc's duplicated-gram hit positions into maximal
    // contiguous SPANS — the regions a span-removal pass would cut,
    // reported as (span count, covered tokens) per affected doc. Two
    // shuffles at any scale: the gram groupBy (dup detection) and the
    // gram-keyed join back; the span merge is a classic gaps-and-islands
    // window per doc (running max of span end, island break when a hit
    // starts past it). At 100 TB the gram table is the big object — the
    // production mitigation is hashing grams to 8-byte fingerprints
    // before the shuffle (the dedup_minhash_lsh kernel's trick), which
    // changes none of the span logic.
    Q(
      "dedup_substring_spans",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |g0 AS (SELECT doc_id,
        |              list_transform(range(len(words) - 4),
        |                             i -> array_to_string(words[(i+1):(i+5)], ' ')) AS gl
        |       FROM w),
        |grams AS (SELECT doc_id, generate_subscripts(gl, 1) - 1 AS pos, unnest(gl) AS gram FROM g0),
        |dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) > 1),
        |hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)),
        |isl AS (SELECT doc_id, pos,
        |               CASE WHEN pos > coalesce(max(pos) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -99) + 5
        |                    THEN 1 ELSE 0 END AS brk
        |        FROM hits),
        |isl2 AS (SELECT doc_id, pos,
        |                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |         FROM isl),
        |spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e
        |          FROM isl2 GROUP BY doc_id, island)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_dup_spans,
        |       CAST(sum(e - s) AS INTEGER) AS dup_tokens
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val k = 5
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val grams = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .where(size(col("words")) >= k)
        .select(
          col("doc_id"),
          posexplode(expr(s"transform(sequence(0, size(words) - $k), i -> array_join(slice(words, i + 1, $k), ' '))"))
            .as(Seq("pos", "gram")),
        )
      val dup = grams.groupBy("gram").agg(count(lit(1)).as("n")).where(col("n") > 1).select("gram")
      val hits = grams.join(dup, "gram").select("doc_id", "pos")
      val isl = hits
        .withColumn(
          "brk",
          when(
            col("pos") > coalesce(
              max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(-99),
            ) + k,
            1,
          ).otherwise(0),
        )
        .withColumn("island", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      isl
        .groupBy("doc_id", "island")
        .agg(min("pos").as("s"), (max("pos") + k).as("e"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).cast("int").as("n_dup_spans"),
          sum(col("e") - col("s")).cast("int").as("dup_tokens"),
        )
        .orderBy("doc_id")
    },

    // ----- the 100-TB shape of the span dedup above: hash each 5-gram to
    // a 60-bit fingerprint (15 hex chars of md5 — the largest md5 slice
    // both engines cast to BIGINT without sign trouble) BEFORE the
    // duplicate-detection shuffle and the join back. The two corpus-wide
    // shuffles then carry (doc_id, pos, int64) rows instead of full
    // gram strings — fixed ~20 bytes/row versus ~5 words of text — and
    // every downstream step (gaps-and-islands span merge) is untouched.
    // A fingerprint collision can only ADD a false duplicate gram
    // (birthday bound N²/2⁶¹ — at fixture scale zero, pinned equal to
    // the string-keyed query by SubstringSpanSpec; at 10¹² grams a
    // handful of spurious spans, the standard Lee et al. trade).
    Q(
      "dedup_substring_spans_fp",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
        |           FROM documents WHERE len(string_split(text, ' ')) >= 5),
        |g0 AS (SELECT doc_id,
        |              list_transform(range(len(words) - 4),
        |                             i -> array_to_string(words[(i+1):(i+5)], ' ')) AS gl
        |       FROM w),
        |grams0 AS (SELECT doc_id, generate_subscripts(gl, 1) - 1 AS pos, unnest(gl) AS gram FROM g0),
        |grams AS (SELECT doc_id, pos, ('0x' || substr(md5(gram), 1, 15))::BIGINT AS fp FROM grams0),
        |dup AS (SELECT fp FROM grams GROUP BY fp HAVING count(*) > 1),
        |hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (fp)),
        |isl AS (SELECT doc_id, pos,
        |               CASE WHEN pos > coalesce(max(pos) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -99) + 5
        |                    THEN 1 ELSE 0 END AS brk
        |        FROM hits),
        |isl2 AS (SELECT doc_id, pos,
        |                sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        |         FROM isl),
        |spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 5 AS e
        |          FROM isl2 GROUP BY doc_id, island)
        |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_dup_spans,
        |       CAST(sum(e - s) AS INTEGER) AS dup_tokens
        |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val k = 5
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val grams = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .where(size(col("words")) >= k)
        .select(
          col("doc_id"),
          posexplode(expr(s"transform(sequence(0, size(words) - $k), i -> array_join(slice(words, i + 1, $k), ' '))"))
            .as(Seq("pos", "gram")),
        )
        .select(
          col("doc_id"), col("pos"),
          expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)").as("fp"),
        )
      val dup = grams.groupBy("fp").agg(count(lit(1)).as("n")).where(col("n") > 1).select("fp")
      val hits = grams.join(dup, "fp").select("doc_id", "pos")
      val isl = hits
        .withColumn(
          "brk",
          when(
            col("pos") > coalesce(
              max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(-99),
            ) + k,
            1,
          ).otherwise(0),
        )
        .withColumn("island", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      isl
        .groupBy("doc_id", "island")
        .agg(min("pos").as("s"), (max("pos") + k).as("e"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).cast("int").as("n_dup_spans"),
          sum(col("e") - col("s")).cast("int").as("dup_tokens"),
        )
        .orderBy("doc_id")
    },

    // ----- corpus-wide repeated-PARAGRAPH removal with reassembly (the
    // MassiveText/Gopher dedup unit between exact-doc and substring
    // spans): keep only the FIRST occurrence of every distinct
    // paragraph across the whole corpus — ordered by (doc_id, position)
    // — drop every later repeat (including repeats within one doc), and
    // rebuild each document from its surviving paragraphs in order. The
    // fixture corpus has no newline delimiters, so a "paragraph" is a
    // fixed 10-word unit; the pipeline is delimiter-agnostic. Scale
    // shape: one corpus-wide window over the paragraph hash (rank of
    // first occurrence — the same shuffle an exact-dedup groupBy pays)
    // and one per-doc reassembly agg; at 100 TB the window would key on
    // a 128-bit hash of the paragraph, not its text, exactly like the
    // _fp span variant above.
    Q(
      "dedup_paragraphs",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ix AS (SELECT doc_id, ws,
        |              unnest(generate_series(1, CAST(ceil(len(ws) / 10.0) AS INTEGER))) AS i
        |       FROM w),
        |para AS (SELECT doc_id, i AS pidx,
        |                array_to_string(ws[(i - 1) * 10 + 1 : i * 10], ' ') AS p
        |         FROM ix),
        |ranked AS (SELECT doc_id, pidx, p,
        |                  row_number() OVER (PARTITION BY p ORDER BY doc_id, pidx) AS rn
        |           FROM para)
        |SELECT doc_id,
        |       CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS INTEGER) AS n_removed,
        |       coalesce(string_agg(CASE WHEN rn = 1 THEN p END, ' ' ORDER BY pidx), '') AS clean_text
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("p").orderBy("doc_id", "pidx")
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(
          col("doc_id"),
          explode(expr("sequence(1, CAST(ceil(size(ws) / 10.0) AS INT))")).as("pidx"),
          col("ws"),
        )
        .select(
          col("doc_id"), col("pidx"),
          expr("array_join(slice(ws, (pidx - 1) * 10 + 1, 10), ' ')").as("p"),
        )
        .withColumn("rn", row_number().over(w))
        .groupBy("doc_id")
        .agg(
          sum(when(col("rn") === 1, 0).otherwise(1)).cast("int").as("n_removed"),
          concat_ws(
            " ",
            expr("transform(array_sort(collect_list(CASE WHEN rn = 1 THEN struct(pidx, p) END)), x -> x.p)"),
          ).as("clean_text"),
        )
        .orderBy("doc_id")
    },

    // ----- the 100-TB form of the paragraph dedup above, the same move
    // as dedup_substring_spans_fp: the duplicate-DETECTION shuffle (the
    // corpus-wide first-occurrence window) carries 60-bit md5
    // fingerprints + (doc_id, pidx) — ~24-byte rows — instead of full
    // paragraph text; text then moves only on doc_id-keyed paths (the
    // keep-flag join back and the reassembly agg), which any
    // reassembling dedup pays regardless. Collisions can only remove a
    // FALSE extra paragraph (birthday bound N²/2⁶¹); at fixture scale
    // zero — output pinned identical to the string-keyed query by
    // QueryWitnessSpec.
    Q(
      "dedup_paragraphs_fp",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ix AS (SELECT doc_id, ws,
        |              unnest(generate_series(1, CAST(ceil(len(ws) / 10.0) AS INTEGER))) AS i
        |       FROM w),
        |para AS (SELECT doc_id, i AS pidx,
        |                array_to_string(ws[(i - 1) * 10 + 1 : i * 10], ' ') AS p
        |         FROM ix),
        |ranked AS (SELECT doc_id, pidx,
        |                  row_number() OVER (PARTITION BY ('0x' || substr(md5(p), 1, 15))::BIGINT
        |                                     ORDER BY doc_id, pidx) AS rn
        |           FROM para)
        |SELECT para.doc_id,
        |       CAST(sum(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS INTEGER) AS n_removed,
        |       coalesce(string_agg(CASE WHEN rn = 1 THEN p END, ' ' ORDER BY para.pidx), '') AS clean_text
        |FROM para JOIN ranked ON para.doc_id = ranked.doc_id AND para.pidx = ranked.pidx
        |GROUP BY para.doc_id ORDER BY para.doc_id""".stripMargin,
    ) { (s, d) =>
      val chunks = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(
          col("doc_id"),
          explode(expr("sequence(1, CAST(ceil(size(ws) / 10.0) AS INT))")).as("pidx"),
          col("ws"),
        )
        .select(
          col("doc_id"), col("pidx"),
          expr("array_join(slice(ws, (pidx - 1) * 10 + 1, 10), ' ')").as("p"),
        )
      // narrow detection: only (fp, doc_id, pidx) enters the window shuffle
      val w = Window.partitionBy("fp").orderBy("doc_id", "pidx")
      val flags = chunks
        .select(
          col("doc_id"), col("pidx"),
          expr("CAST(conv(substring(md5(p), 1, 15), 16, 10) AS BIGINT)").as("fp"),
        )
        .withColumn("rn", row_number().over(w))
        .select(col("doc_id"), col("pidx"), col("rn"))
      chunks
        .join(flags, Seq("doc_id", "pidx"))
        .groupBy("doc_id")
        .agg(
          sum(when(col("rn") === 1, 0).otherwise(1)).cast("int").as("n_removed"),
          concat_ws(
            " ",
            expr("transform(array_sort(collect_list(CASE WHEN rn = 1 THEN struct(pidx, p) END)), x -> x.p)"),
          ).as("clean_text"),
        )
        .orderBy("doc_id")
    },

    // ----- decontaminated train/eval split: the leakage check every
    // benchmark split needs. Docs split 90/10 by md5 bucket; an eval
    // doc is LEAKY when it shares a MinHash LSH band with ANY train
    // doc (a near-duplicate of training data inflates eval scores —
    // the reverse direction of text_decontaminate, which protects the
    // train side from the benchmark). One shared shingle/minhash pass
    // covers both splits; the leak probe is a band-keyed semi-join —
    // eval×train candidates only where signatures collide, never
    // all-pairs, so it scales exactly like dedup_minhash_cross.
    // Short docs (<3 words, no shingles) cannot leak and pass clean.
    Q(
      "split_decontaminated",
      s"""WITH $shinglesSqlCte,
         |${minhashBandsSqlCte(4)},
         |bk AS (SELECT doc_id,
         |              ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 AS bucket
         |       FROM documents),
         |wb AS (SELECT b.doc_id, b.band, b.sig, bk.bucket
         |       FROM bands b JOIN bk ON b.doc_id = bk.doc_id),
         |leak AS (SELECT DISTINCT e.doc_id
         |         FROM wb e JOIN wb t ON e.band = t.band AND e.sig = t.sig
         |         WHERE e.bucket = 0 AND t.bucket <> 0)
         |SELECT d.doc_id, d.source,
         |       CAST(CASE WHEN l.doc_id IS NULL THEN 0 ELSE 1 END AS INTEGER) AS leaky
         |FROM documents d
         |JOIN bk ON d.doc_id = bk.doc_id
         |LEFT JOIN leak l ON d.doc_id = l.doc_id
         |WHERE bk.bucket = 0
         |ORDER BY d.doc_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val bucket =
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10")
      val withB = minhashBands(s, docs)
        .join(docs.select(col("doc_id"), bucket.as("bucket")), "doc_id")
      val leak = withB.where(col("bucket") === 0).as("e")
        .join(
          withB.where(col("bucket") =!= 0).as("t"),
          col("e.band") === col("t.band") && col("e.sig") === col("t.sig"),
          "left_semi",
        )
        .select(col("doc_id")).distinct()
      docs.withColumn("bucket", bucket)
        .where(col("bucket") === 0)
        .join(leak.withColumnRenamed("doc_id", "ld"), col("doc_id") === col("ld"), "left")
        .select(
          col("doc_id"), col("source"),
          when(col("ld").isNull, 0).otherwise(1).cast("int").as("leaky"),
        )
        .orderBy("doc_id")
    },

    // ----- incremental cluster-representative maintenance (ROADMAP 84):
    // the corpus arrives as TWO md5-split batches into a persisted
    // ClusterRepStore — each update screens against the stored bands,
    // contracts merged clusters onto their canonical labels, updates the
    // union-find alias + keeper tables, and emits assert/retract feed
    // rows. The registered output is the folded store ASSIGNMENT, which
    // must equal the one-shot dedup_cluster_rep on the union — the SAME
    // oracle SQL certifies both (order-independence of the final state
    // across any split is the store's core contract; the changefeed's
    // fold identity and the merge/displacement mechanics are pinned in
    // ClusterRepStoreSpec). StoreCache prices re-runs as the assignment
    // read, the store's probe-side cost.
    Q(
      "dedup_cluster_rep_inc",
      clusterRepSql,
    ) { (s, d) =>
      val path = StoreCache.resolve(d, "cluster-rep", table = "documents") { p =>
        // two updates = two sealed pointers, but StoreCache's built check
        // is "any _current-"; stage the whole history and rename into
        // place so a crashed half-build never registers as built
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val docs = Tables.fanout(Tables.documents(s, d))
          .select(col("doc_id"), col("text"), col("n_chars").as("quality"))
        val half = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2")
        graft.operators.ClusterRepStore.update(s, stage.toString, docs.where(half === 0))
        graft.operators.ClusterRepStore.update(s, stage.toString, docs.where(half === 1))
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"cluster-rep store publish rename failed: $stage -> $p")
      }
      graft.operators.ClusterRepStore.assignment(s, path).orderBy("doc_id")
    },

    // ----- retention retractions over the incremental store (ROADMAP
    // 89): after the two-batch build, every doc_id % 7 == 3 is REMOVED
    // — keepers recompute among survivors, dying kept singletons
    // retract, and the STICKY-component contract (clusters keep their
    // historical edges; a dead doc's near-dups still share its
    // cluster) is exactly what the oracle says: components over ALL
    // documents, representatives ranked among survivors only — the
    // WHERE sits between the closure and the window, so the rank sees
    // exactly the surviving rows.
    Q(
      "dedup_cluster_rep_retract",
      clusterRepSqlWhere("\n|WHERE d.doc_id % 7 <> 3"),
    ) { (s, d) =>
      val path = StoreCache.resolve(d, "cluster-rep-retract", table = "documents") { p =>
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val docs = Tables.fanout(Tables.documents(s, d))
          .select(col("doc_id"), col("text"), col("n_chars").as("quality"))
        val half = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2")
        graft.operators.ClusterRepStore.update(s, stage.toString, docs.where(half === 0))
        graft.operators.ClusterRepStore.update(s, stage.toString, docs.where(half === 1))
        graft.operators.ClusterRepStore.retract(s, stage.toString, docs.where(col("doc_id") % 7 === 3).select("doc_id"))
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"cluster-rep-retract store publish rename failed: $stage -> $p")
      }
      graft.operators.ClusterRepStore.assignment(s, path).orderBy("doc_id")
    },
  )

  /** Shared SimHash fingerprint pipeline (doc_id, simhash BIGINT):
    * two 32-bit md5 slices per token, frequency-weighted ±1 votes per
    * bit, 64-bit assembly — identical in [[simhashSqlCte]].
    *
    * The 64 bit-votes ride ONE groupBy(doc_id) (the same single-shuffle
    * shape as the MinHash kernel): the vote `sum(cnt * sign)` over
    * distinct (doc, token) pairs equals `sum(sign)` over raw token
    * occurrences, so the (doc_id, w) count pass, the 64× bit-index
    * fanout join, and the (doc_id, j) shuffle all collapse away. Since
    * r21 the 64 votes + assembly are ONE compiled aggregate
    * ([[graft.functions.SimHashAgg]]) instead of 64 sum columns — same
    * exact integer votes and threshold (spec-pinned), ~1/64th the plan
    * nodes for the three copies dedup_simhash_pairs plans. Map-side
    * partial aggregation still applies: the shuffled state is one
    * 512-byte vote array per doc per partition. Values are
    * bit-identical to the oracle's distinct-token formulation.
    *
    * 64 bits (vs the original 16) is a candidate-volume decision, not a
    * quality nicety: a 16-bit fingerprint banded into two 8-bit halves
    * has only 256 values per band, so band buckets birthday-saturate by
    * a few hundred docs and the pair join degenerates toward a cross
    * product. 16-bit bands (65 536 values) keep buckets O(1) until the
    * corpus dwarfs the band space ~256× — and the df cap bounds even
    * that. Assembly is bitwise OR of disjoint single-bit masks (never
    * `+`): bit 63's mask is `Long.MinValue`, and OR-ing it in is
    * overflow-free and mirror-exact with the oracle's literal.
    */
  private def simhashFp(s: org.apache.spark.sql.SparkSession, d: String): org.apache.spark.sql.DataFrame = {
    // Explicit isnotnull(doc_id) BELOW the fanout: dedup_simhash_pairs'
    // band self-join pushes isnotnull(doc_id) into its two join-side
    // copies of this pipeline but NOT into the bucket-cap (`ok`) copy,
    // so the three subtrees stopped being canonically equal and AQE
    // stage reuse never fired — the whole token→votes pipeline (the
    // dominant cost) executed twice per run (measured: 2× ~3.4 s stages
    // at sf0.1). Pre-filtering makes every consumer's subtree identical,
    // so the votes stage materializes once and is replayed. doc_id is
    // never null in any fixture (primary key), so values are unchanged.
    graft.functions.GraftFunctions.register(s)
    val occ = Tables.fanout(Tables.documents(s, d).where(col("doc_id").isNotNull))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h_lo", expr("CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("h_hi", expr("CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT)"))
    // r21: the 64 vote sums + the 64-way OR assembly collapse into ONE
    // compiled aggregate (graft.functions.SimHashAgg — same exact vote
    // sums, same > 0 threshold and disjoint-mask OR, null parity
    // pinned by SimHashAggSpec). The values are untouched; the point is
    // the PLAN: dedup_simhash_pairs carries three copies of this
    // subtree, and Catalyst re-optimizes the whole tree at every
    // adaptive stage boundary — with 64 aggregate columns the measured
    // driver-side gap (planning + AQE re-optimization) was as large as
    // the query's entire execution.
    occ.groupBy("doc_id")
      .agg(expr("simhash_agg(h_lo, h_hi)").as("simhash"))
  }

}
