package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data-pipeline operators beyond the dedup/similarity/text
  * families: benchmark decontamination, token-budget sequence packing,
  * deterministic stratified sampling, distinctive-term extraction
  * (integer-safe TF-IDF), PassJoin segment blocking for edit-distance
  * self-join, and int8 embedding quantization.
  *
  * Shared discipline with the other query files: md5-derived hashes so
  * DuckDB computes identical values, integer-first ranking metrics so no
  * float tie ever decides a row, and every oracled query ends in a total
  * ORDER BY (SURVEY.md §7.6).
  */
object PipelineQueries {

  /** All pairs with `levenshtein <= 2` from a `(k BIGINT, n STRING)`
    * DataFrame, via PassJoin segment blocking — no all-pairs join.
    *
    * The indexed side splits each string into D+1 = 3 contiguous
    * segments (lengths derived only from the string length); the probe
    * side, for each candidate partner length lb in [len, len+2],
    * extracts the substrings where a segment of an lb-long partner
    * could sit, shifted by the net edit drift delta in [-2, 2].
    * Pigeonhole: 2 edits cannot touch all 3 segments, so every true
    * pair shares an (lb, segment_index, text) join key — the blocking
    * is LOSSLESS (PassJoinSpec pins this against the naive quadratic
    * join on adversarial shapes). Requires strings of length >= 3 so
    * every segment is non-empty; shorter strings are the caller's
    * fallback (an all-pairs join over a length<3 slice is trivially
    * small).
    */
  def passjoinPairs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.select(col("k"), col("n"), length(col("n")).as("len"))
    // indexed side: own 3 segments; start/length derived from len only
    val segs = p.select(
      col("k").as("kb"), col("n").as("nb"), col("len").as("lb"),
      explode(expr(
        """transform(sequence(0, 2), i -> named_struct(
          |  'idx', i,
          |  'st', 1 + i * (len div 3) + greatest(0, i - (3 - len % 3)),
          |  'ln', (len div 3) + IF(i >= 3 - len % 3, 1, 0)))""".stripMargin,
      )).as("sg"),
    ).select(
      col("kb"), col("nb"), col("lb"), col("sg.idx").as("idx"),
      expr("substring(nb, sg.st, sg.ln)").as("seg"),
    )
    // probe side: substrings where an lb-long partner's segment could
    // sit, for each lb in [len, len+2] and drift delta in [-2, 2]
    val probes = p.select(
      col("k").as("ka"), col("n").as("na"), col("len"),
      explode(expr(
        """flatten(flatten(transform(sequence(len, len + 2), lb ->
          |  transform(sequence(0, 2), i ->
          |    transform(sequence(-2, 2), d -> named_struct(
          |      'lb', lb, 'idx', i,
          |      'st', 1 + i * (lb div 3) + greatest(0, i - (3 - lb % 3)) + d,
          |      'ln', (lb div 3) + IF(i >= 3 - lb % 3, 1, 0)))))))""".stripMargin,
      )).as("pr"),
    ).where(col("pr.st") >= 1)
      .select(
        col("ka"), col("na"), col("pr.lb").as("lb"), col("pr.idx").as("idx"),
        expr("substring(na, pr.st, pr.ln)").as("seg"),
      )
    probes
      .join(segs, Seq("lb", "idx", "seg"))
      .where(col("ka") =!= col("kb"))
      .select(
        least(col("ka"), col("kb")).as("key_a"),
        greatest(col("ka"), col("kb")).as("key_b"),
        when(col("ka") < col("kb"), col("na")).otherwise(col("nb")).as("n1"),
        when(col("ka") < col("kb"), col("nb")).otherwise(col("na")).as("n2"),
      )
      .distinct()
      .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("int"))
      .where(col("dist") <= 2)
      .select("key_a", "key_b", "dist")
  }

  /** Next-fit greedy pack assignment over a `(lang, doc_id, n_tok)`
    * DataFrame: within each lang, docs in doc_id order accumulate into
    * the current pack until the next doc would exceed `budget`, which
    * opens a new pack (an oversize doc gets a solo pack). Returns
    * `(lang, doc_id, n_tok, pack_id)`. The state is irreducibly
    * sequential WITHIN a stratum — one repartition on lang +
    * sortWithinPartitions + a per-partition fold; strata stay parallel.
    */
  def packGreedy(docs: org.apache.spark.sql.DataFrame, budget: Int): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .as[(String, Long, Int)]
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .mapPartitions { it =>
        // several langs can share a partition (hash-partitioned);
        // state resets on the lang boundary — sortWithinPartitions
        // groups each lang contiguously
        var lang: String = null
        var pack = 0L
        var fill = 0
        it.map { case (l, id, n) =>
          if (l != lang) { lang = l; pack = 0L; fill = n }
          else if (fill + n <= budget) fill += n
          else { pack += 1; fill = n }
          (l, id, n, pack)
        }
      }
      .toDF("lang", "doc_id", "n_tok", "pack_id")
  }

  /** First-fit pack assignment over a `(lang, doc_id, n_tok)` DataFrame:
    * within each lang, each doc (in doc_id order) lands in the FIRST
    * open pack with room, opening a new pack only when none fits — the
    * classic bin-packing heuristic, tighter than [[packGreedy]]'s
    * next-fit (which only ever looks at the newest pack). Same
    * distribution shape: repartition on lang + sortWithinPartitions +
    * per-partition fold; the extra state is the open-pack fill list,
    * which grows with packs-per-stratum — at 100 TB cap it (first-fit
    * over a bounded window of newest packs) or pre-split strata; here
    * strata are bounded so the pure form is exact.
    */
  def packFirstFit(docs: org.apache.spark.sql.DataFrame, budget: Int): org.apache.spark.sql.DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .as[(String, Long, Int)]
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .mapPartitions { it =>
        var lang: String = null
        var fills: scala.collection.mutable.ArrayBuffer[Int] = null
        it.map { case (l, id, n) =>
          if (l != lang) { lang = l; fills = scala.collection.mutable.ArrayBuffer.empty[Int] }
          val i = fills.indexWhere(_ + n <= budget)
          val pack =
            if (i >= 0) { fills(i) += n; i.toLong }
            else { fills += n; (fills.length - 1).toLong }
          (l, id, n, pack)
        }
      }
      .toDF("lang", "doc_id", "n_tok", "pack_id")
  }

  /** Bounded-window first-fit: like [[packFirstFit]], but a doc may only
    * land in one of the newest `window` open packs — older packs are
    * retired and never revisited. This is the 100-TB dial the pure form
    * documents: pure first-fit's open-pack list grows with
    * packs-per-stratum (at 100 TB, millions of packs → O(packs) scan
    * per doc and unbounded state), while the windowed form holds O(window)
    * state and still fills near-first-fit-tight for realistic doc-size
    * distributions. Exactly equal to pure first-fit whenever a stratum's
    * total pack count stays ≤ `window` (no pack is ever retired) —
    * PackWindowSpec pins that property on randomized inputs.
    */
  def packFirstFitWindowed(docs: org.apache.spark.sql.DataFrame, budget: Int, window: Int): org.apache.spark.sql.DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val s = docs.sparkSession
    import s.implicits._
    docs
      .as[(String, Long, Int)]
      .repartition(col("lang"))
      .sortWithinPartitions("lang", "doc_id")
      .mapPartitions { it =>
        var lang: String = null
        var nextPack = 0L
        // newest `window` open packs, ascending creation order
        var open: scala.collection.mutable.ArrayBuffer[(Long, Int)] = null
        it.map { case (l, id, n) =>
          if (l != lang) {
            lang = l; nextPack = 0L
            open = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
          }
          val i = open.indexWhere(_._2 + n <= budget)
          val pack =
            if (i >= 0) { val (p, f) = open(i); open(i) = (p, f + n); p }
            else {
              val p = nextPack; nextPack += 1
              open += ((p, n))
              if (open.length > window) open.remove(0) // retire the oldest
              p
            }
          (l, id, n, pack)
        }
      }
      .toDF("lang", "doc_id", "n_tok", "pack_id")
  }

  /** 5-word shingles (decontamination uses longer n-grams than dedup's
    * 3-shingles — a short n-gram collides on common phrases; a training
    * pipeline flags eval contamination on long, rare spans).
    */
  private def shingles5(s: org.apache.spark.sql.SparkSession) = {
    graft.functions.GraftFunctions.register(s)
    expr("word_shingles(w, 5)")
  }

  private val shingles5SqlCte =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |              unnest(list_transform(range(1, len(w) - 3),
      |                     i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4])) AS sh
      |       FROM ws)""".stripMargin

  /** Snake (serpentine) shard assignment over a `(doc_id, source,
    * n_tok)` frame: within each source, rows order by token count DESC
    * (ties by doc_id) and deal out 0..S-1 then S-1..0. Adds `shard`.
    * Balance contract (SelectionWitnessSpec): per source, shard row
    * counts differ by <= 1 by construction, and token sums stay within
    * one largest item of each other — the sorted-serpentine bound.
    */
  private[graft] def snakeShards(df: org.apache.spark.sql.DataFrame, nShards: Int): org.apache.spark.sql.DataFrame = {
    val cycle = 2 * nShards
    val wPos = Window.partitionBy("source").orderBy(desc("n_tok"), col("doc_id"))
    df.withColumn("pos", row_number().over(wPos) - 1)
      .withColumn(
        "shard",
        when(pmod(col("pos"), lit(cycle)) < nShards, pmod(col("pos"), lit(cycle)))
          .otherwise(lit(cycle - 1) - pmod(col("pos"), lit(cycle))).cast("int"),
      )
  }

  val qs: Seq[Q] = Seq(

    // ----- benchmark decontamination: which training documents share
    // >= 2 distinct 5-gram spans with a held-out eval slice? The eval
    // set (doc_id % 7 = 0 here; a real benchmark table in production) is
    // tiny relative to the corpus, so its shingle set is BROADCAST —
    // the 100-TB scan streams past it with no shuffle on the train side
    // until the per-pair count, which is bounded by actual collisions.
    Q(
      "text_decontaminate",
      s"""WITH $shingles5SqlCte,
         |ev AS (SELECT doc_id, sh FROM sh WHERE doc_id % 7 = 0),
         |tr AS (SELECT doc_id, sh FROM sh WHERE doc_id % 7 <> 0)
         |SELECT ev.doc_id AS eval_doc, tr.doc_id AS train_doc,
         |       count(*) AS n_shared
         |FROM tr JOIN ev ON tr.sh = ev.sh
         |GROUP BY ev.doc_id, tr.doc_id
         |HAVING count(*) >= 2
         |ORDER BY eval_doc, train_doc""".stripMargin,
    ) { (s, d) =>
      val sh = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .where(size(col("w")) >= 5)
        .select(col("doc_id"), explode(shingles5(s)).as("sh"))
        .distinct()
      val ev = sh.where(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("eval_doc"), col("sh"))
      val tr = sh.where(col("doc_id") % 7 =!= 0)
        .select(col("doc_id").as("train_doc"), col("sh"))
      tr.join(broadcast(ev), "sh")
        .groupBy("eval_doc", "train_doc")
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .orderBy("eval_doc", "train_doc")
    },

    // ----- token-budget sequence packing: assign documents (in stable
    // doc_id order, per lang) to fixed-budget context windows by running
    // token count — the pack is where the document STARTS. One window
    // function per lang partition = one shuffle, integer arithmetic
    // only. (True greedy bin packing needs sequential state; offset
    // packing is the standard distributed approximation and is exactly
    // reproducible in SQL.)
    Q(
      "text_pack_sequences",
      """WITH t AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents),
        |c AS (SELECT lang, doc_id, n_tok,
        |             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM t)
        |SELECT lang, CAST((cum - n_tok) // 256 AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM c GROUP BY lang, (cum - n_tok) // 256
        |ORDER BY lang, pack_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).as("n_tok"))
        .withColumn("cum", sum("n_tok").over(w))
        .withColumn("pack_id", expr("(cum - n_tok) div 256").cast("bigint"))
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").cast("bigint").as("pack_tokens"),
          min("doc_id").as("first_doc"),
        )
        .orderBy("lang", "pack_id")
    },

    // ----- full training-prep composition in ONE Catalyst plan:
    // exact-dedup keeper selection -> minimum-length gate ->
    // deterministic md5 stratified sample -> per-lang sequence packing.
    // Each stage is the operator benchmarked individually; composed,
    // Catalyst pipelines them into one job graph (dedup's hash agg is
    // the only corpus-wide shuffle before the per-lang pack window).
    // The sample stage costs no shuffle at all — the bucket predicate
    // evaluates in the scan stage — and the pack window partitions by
    // lang, the same per-stratum fold shape as text_pack_sequences.
    Q(
      "pipeline_train_prep",
      """WITH k AS (SELECT md5(text) AS h, min(doc_id) AS keeper
        |           FROM documents GROUP BY md5(text)),
        |base AS (SELECT d.lang, d.doc_id, len(string_split(d.text, ' ')) AS n_tok
        |         FROM documents d
        |         JOIN k ON md5(d.text) = k.h AND k.keeper = d.doc_id
        |         WHERE len(string_split(d.text, ' ')) >= 8
        |           AND ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |               < CASE WHEN d.lang = 'en' THEN 20 ELSE 50 END),
        |c AS (SELECT lang, doc_id, n_tok,
        |             sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
        |                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM base)
        |SELECT lang, CAST((cum - n_tok) // 256 AS BIGINT) AS pack_id,
        |       count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM c GROUP BY lang, (cum - n_tok) // 256
        |ORDER BY lang, pack_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val k = docs.groupBy(md5(col("text")).as("h")).agg(min("doc_id").as("keeper"))
      val bucket =
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
      val base = docs
        .join(k, md5(col("text")) === col("h") && col("keeper") === col("doc_id"))
        .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).as("n_tok"), bucket.as("bucket"))
        .where(col("n_tok") >= 8 && col("bucket") < when(col("lang") === "en", 20).otherwise(50))
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base
        .withColumn("cum", sum("n_tok").over(w))
        .withColumn("pack_id", expr("(cum - n_tok) div 256").cast("bigint"))
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").cast("bigint").as("pack_tokens"),
          min("doc_id").as("first_doc"),
        )
        .orderBy("lang", "pack_id")
    },

    // ----- deterministic stratified sampling: md5(doc_id) → uniform
    // bucket 0..99, per-stratum keep-rate (10% of the dominant lang,
    // 40% elsewhere — downsample the head, keep the tail). Reproducible
    // across engines, runs, and cluster sizes — unlike rand()-based
    // TABLESAMPLE — so a 100-TB sample is re-derivable from the rule
    // alone. Pure scan + filter: no shuffle at all.
    Q(
      "sample_stratified_hash",
      """SELECT doc_id, lang,
        |       CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS INTEGER) AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
        |      < CASE WHEN lang = 'en' THEN 10 ELSE 40 END
        |ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val bucket =
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
      Tables.documents(s, d)
        .withColumn("bucket", bucket.cast("int"))
        .where(col("bucket") < when(col("lang") === "en", 10).otherwise(40))
        .select("doc_id", "lang", "bucket")
        .orderBy("doc_id")
    },

    // ----- per-stratum cap: keep at most K docs per lang, chosen by a
    // deterministic md5 shuffle order (not "first K by doc_id", which
    // biases toward old data). The complement of sample_stratified_hash:
    // that one filters by RATE with no shuffle; this one guarantees an
    // exact per-group COUNT, at the cost of one shuffle on the stratum
    // key. At 100 TB a stratum fits a partition after the hash shuffle,
    // and the window never sees more than one stratum.
    Q(
      "sample_group_cap",
      """WITH r AS (SELECT doc_id, lang, source,
        |                  row_number() OVER (
        |                    PARTITION BY lang
        |                    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT, doc_id
        |                  ) AS rn
        |           FROM documents)
        |SELECT doc_id, lang, source, CAST(rn AS INTEGER) AS rn
        |FROM r WHERE rn <= 20 ORDER BY lang, rn""".stripMargin,
    ) { (s, d) =>
      val order = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
      val w = Window.partitionBy("lang").orderBy(order.asc, col("doc_id").asc)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"))
        .withColumn("rn", row_number().over(w).cast("int"))
        .where(col("rn") <= 20)
        .orderBy("lang", "rn")
    },

    // ----- TRUE greedy (next-fit) sequence packing: walk each lang's
    // docs in doc_id order, keep a running fill, open a new pack when
    // the next doc would overflow the 256-token budget. Genuinely
    // sequential state → one repartition on lang + sortWithinPartitions
    // + a per-partition fold (the mapPartitions escape hatch used as
    // designed: the dependency is irreducibly sequential WITHIN a
    // stratum, while strata stay parallel). Contrast with
    // text_pack_sequences, whose offset rule is window-expressible but
    // lets a pack overflow when a doc straddles the boundary; next-fit
    // never overflows (oversize docs get a solo pack). The oracle
    // replays the same walk as a recursive CTE — sequential semantics,
    // declared declaratively.
    Q(
      "text_pack_greedy",
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents),
        |rec AS (
        |  SELECT lang, doc_id, n_tok, rn, 0 AS pack_id, n_tok AS fill
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.lang, t.doc_id, t.n_tok, t.rn,
        |         CASE WHEN rec.fill + t.n_tok <= 256 THEN rec.pack_id ELSE rec.pack_id + 1 END,
        |         CASE WHEN rec.fill + t.n_tok <= 256 THEN rec.fill + t.n_tok ELSE t.n_tok END
        |  FROM rec JOIN t ON t.lang = rec.lang AND t.rn = rec.rn + 1)
        |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM rec GROUP BY lang, pack_id
        |ORDER BY lang, pack_id""".stripMargin,
    ) { (s, d) =>
      packGreedy(
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).as("n_tok")),
        budget = 256,
      )
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").cast("bigint").as("pack_tokens"),
          min("doc_id").as("first_doc"),
        )
        .orderBy("lang", "pack_id")
    },

    // ----- FIRST-FIT sequence packing (see [[packFirstFit]]): each doc
    // lands in the first open pack with room, not just the newest — the
    // tighter classic heuristic next to text_pack_greedy's next-fit.
    // The oracle replays the identical walk as a recursive CTE whose
    // state is the open-pack fill LIST (list_position finds the first
    // fit, an indexed list_transform applies it) — sequential list
    // semantics, declared declaratively.
    Q(
      "text_pack_firstfit",
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents),
        |rec AS (
        |  SELECT lang, doc_id, n_tok, rn, 0 AS pack_id, [n_tok] AS fills
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT lang, doc_id, n_tok, rn,
        |         CASE WHEN pos = 0 THEN len(fills) ELSE pos - 1 END,
        |         CASE WHEN pos = 0 THEN list_append(fills, n_tok)
        |              ELSE list_transform(fills, (f, j) -> CASE WHEN j = pos THEN f + n_tok ELSE f END) END
        |  FROM (SELECT t.lang, t.doc_id, t.n_tok, t.rn, rec.fills,
        |               coalesce(list_position(list_transform(rec.fills, f -> f + t.n_tok <= 256), true), 0) AS pos
        |        FROM rec JOIN t ON t.lang = rec.lang AND t.rn = rec.rn + 1))
        |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM rec GROUP BY lang, pack_id
        |ORDER BY lang, pack_id""".stripMargin,
    ) { (s, d) =>
      packFirstFit(
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).as("n_tok")),
        budget = 256,
      )
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").cast("bigint").as("pack_tokens"),
          min("doc_id").as("first_doc"),
        )
        .orderBy("lang", "pack_id")
    },

    // ----- bounded-window first-fit: the 100-TB form of first-fit —
    // only the newest 4 open packs are candidates, so per-doc state is
    // O(window) instead of O(packs-per-stratum). Oracle: the same
    // recursive-CTE list state, with candidacy restricted to the last 4
    // list positions (retired packs are exactly the positions before
    // the window).
    Q(
      "text_pack_firstfit_window",
      """WITH RECURSIVE t AS (
        |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
        |         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
        |  FROM documents),
        |rec AS (
        |  SELECT lang, doc_id, n_tok, rn, 0 AS pack_id, [n_tok] AS fills
        |  FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT lang, doc_id, n_tok, rn,
        |         CASE WHEN pos = 0 THEN len(fills) ELSE pos - 1 END,
        |         CASE WHEN pos = 0 THEN list_append(fills, n_tok)
        |              ELSE list_transform(fills, (f, j) -> CASE WHEN j = pos THEN f + n_tok ELSE f END) END
        |  FROM (SELECT t.lang, t.doc_id, t.n_tok, t.rn, rec.fills,
        |               coalesce(list_position(list_transform(rec.fills,
        |                          (f, j) -> j > len(rec.fills) - 4 AND f + t.n_tok <= 256), true), 0) AS pos
        |        FROM rec JOIN t ON t.lang = rec.lang AND t.rn = rec.rn + 1))
        |SELECT lang, CAST(pack_id AS BIGINT) AS pack_id, count(*) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
        |       CAST(min(doc_id) AS BIGINT) AS first_doc
        |FROM rec GROUP BY lang, pack_id
        |ORDER BY lang, pack_id""".stripMargin,
    ) { (s, d) =>
      packFirstFitWindowed(
        Tables.documents(s, d)
          .select(col("lang"), col("doc_id"), size(split(col("text"), " ")).as("n_tok")),
        budget = 256,
        window = 4,
      )
        .groupBy("lang", "pack_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").cast("bigint").as("pack_tokens"),
          min("doc_id").as("first_doc"),
        )
        .orderBy("lang", "pack_id")
    },

    // ----- distinctive terms per document: top-3 by (tf DESC, df ASC,
    // word ASC). Integer-only TF-IDF ranking — tf and document
    // frequency order the terms without ever computing a float score,
    // so no log()-ulp difference between engines can flip a rank. Two
    // shuffles: per-(doc,word) tf, then the broadcast-joined df.
    Q(
      "text_tfidf_topk",
      """WITH tf AS (SELECT doc_id, word, count(*) AS tf
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
        |            GROUP BY doc_id, word),
        |df AS (SELECT word, count(*) AS df FROM tf GROUP BY word),
        |r AS (SELECT tf.doc_id, tf.word, tf.tf, df.df,
        |             row_number() OVER (PARTITION BY tf.doc_id
        |                                ORDER BY tf.tf DESC, df.df ASC, tf.word) AS rank
        |      FROM tf JOIN df ON tf.word = df.word)
        |SELECT doc_id, CAST(rank AS INTEGER) AS rank, word, tf, df
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    ) { (s, d) =>
      val tf = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id", "word")
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("word").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(desc("tf"), asc("df"), asc("word"))
      tf.join(broadcast(df), "word")
        .withColumn("rank", row_number().over(w).cast("int"))
        .where(col("rank") <= 3)
        .select("doc_id", "rank", "word", "tf", "df")
        .orderBy("doc_id", "rank")
    },

    // ----- PassJoin segment blocking (see [[passjoinPairs]]): all
    // pairs with edit distance <= 2 among the first 1000 part names,
    // WITHOUT an all-pairs join. The blocking is lossless (pigeonhole),
    // which is why the oracle is the plain unblocked self-join: a hash
    // match proves zero false negatives, not just agreement on the same
    // shortcut. Candidates per probe row: 3 lengths x 3 segments x 5
    // shifts = 45 keys — linear in corpus size vs the quadratic verify.
    Q(
      "text_passjoin",
      """WITH p AS (SELECT p_partkey AS k, p_name AS n FROM part WHERE p_partkey <= 1000)
        |SELECT a.k AS key_a, b.k AS key_b,
        |       CAST(levenshtein(a.n, b.n) AS INTEGER) AS dist
        |FROM p a JOIN p b ON a.k < b.k
        |WHERE levenshtein(a.n, b.n) <= 2
        |ORDER BY key_a, key_b""".stripMargin,
    ) { (s, d) =>
      passjoinPairs(
        Tables.part(s, d)
          .where(col("p_partkey") <= 1000)
          .select(col("p_partkey").as("k"), col("p_name").as("n")),
      ).orderBy("key_a", "key_b")
    },

    // ----- int8 embedding quantization: per-vector symmetric scale
    // (max |x| / 127), floor-quantize (floor, never round — round-half
    // ties differ between engines; floor is exact IEEE on both), and
    // the max reconstruction error as the quality metric. Pure map —
    // no shuffle; at 100 TB this is the standard 4x storage/bandwidth
    // cut before ANN indexing.
    Q(
      "vector_quantize_int8",
      """WITH s AS (SELECT vec_id,
        |                  list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'max') / 127 AS scale,
        |                  embedding
        |           FROM embeddings)
        |SELECT vec_id, scale,
        |       CAST(floor(CAST(embedding[1] AS DOUBLE) / scale) AS INTEGER) AS q1,
        |       CAST(floor(CAST(embedding[2] AS DOUBLE) / scale) AS INTEGER) AS q2,
        |       CAST(floor(CAST(embedding[3] AS DOUBLE) / scale) AS INTEGER) AS q3,
        |       list_aggregate(list_transform(embedding,
        |            x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / scale) * scale)), 'max') AS max_err
        |FROM s WHERE scale > 0 ORDER BY vec_id""".stripMargin,
    ) { (s, d) =>
      Tables.embeddings(s, d)
        .withColumn(
          "scale",
          expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127"),
        )
        .where(col("scale") > 0)
        .select(
          col("vec_id"), col("scale"),
          expr("CAST(floor(CAST(embedding[0] AS DOUBLE) / scale) AS INT)").as("q1"),
          expr("CAST(floor(CAST(embedding[1] AS DOUBLE) / scale) AS INT)").as("q2"),
          expr("CAST(floor(CAST(embedding[2] AS DOUBLE) / scale) AS INT)").as("q3"),
          expr(
            "array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / scale) * scale)))",
          ).as("max_err"),
        )
        .orderBy("vec_id")
    },

    // ----- temperature (alpha) resampling across languages: flatten the
    // lang distribution toward n_l^alpha (alpha = 0.5) by keeping each
    // lang at rate sqrt(min_n / n_l) — the rarest lang keeps everything,
    // head langs downsample toward it. The multilingual mixing step of
    // every LLM corpus build (the alpha-sampling of GPT-3/CC-100),
    // deterministic here via the md5-bucket trick of
    // sample_stratified_hash so reruns and the oracle agree row-for-row.
    // Plan shape at 100 TB: the rate table is a per-lang aggregate
    // (bytes), broadcast back onto a pure scan+filter — the corpus
    // itself never shuffles. sqrt over the same integers is correctly
    // rounded IEEE in both engines, and floor(r * 10000) makes the
    // threshold integral, so the filter boundary cannot drift.
    Q(
      "sample_temperature",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT lang, n,
        |             CAST(floor(sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / n) * 10000) AS BIGINT) AS thr
        |      FROM c)
        |SELECT d.doc_id, d.lang, CAST(t.thr AS INTEGER) AS thr,
        |       CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS INTEGER) AS bucket
        |FROM documents d JOIN t ON d.lang = t.lang
        |WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 < t.thr
        |ORDER BY d.doc_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      // scalar min over a handful of lang rows: window-min avoids a
      // second aggregate + cross join, stays one tiny exchange
      val rates = counts
        .withColumn("min_n", min("n").over(Window.partitionBy()))
        .select(
          col("lang"),
          floor(sqrt(col("min_n").cast("double") / col("n")) * 10000).as("thr"),
        )
      val bucket =
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10000")
      docs
        .join(broadcast(rates), "lang")
        .withColumn("bucket", bucket.cast("int"))
        .where(col("bucket") < col("thr"))
        .select(col("doc_id"), col("lang"), col("thr").cast("int").as("thr"), col("bucket"))
        .orderBy("doc_id")
    },

    // ----- mixture sampling to per-domain TOKEN budgets: the step that
    // turns "mix sources at weights w_s" into an actual training set.
    // Each source's budget is its share w_s/Σw of a global token budget
    // (weights here: even-numbered sources 2, odd 1 — the Σw denominator
    // is derived from the data, not a hardcoded source list); docs are
    // taken in a seeded-hash order (md5 — the deterministic "shuffle",
    // so reruns, engines, and partitionings agree row-for-row) until the
    // running token count exceeds the budget. Plan shape at 100 TB: one
    // tiny distinct-source aggregate broadcast back, then ONE window per
    // source partition — the corpus shuffles once on source (its natural
    // ingest partitioning, usually already in place), never sorts
    // globally. All arithmetic integral: token counts, budgets
    // (integer-div), and cumulative sums cannot drift cross-engine.
    Q(
      "mix_token_budget",
      """WITH t AS (SELECT doc_id, source,
        |                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
        |                  CASE WHEN CAST(substr(source, 4) AS INTEGER) % 2 = 0
        |                       THEN 2 ELSE 1 END AS w,
        |                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |           FROM documents),
        |dn AS (SELECT CAST(sum(w) AS BIGINT) AS denom
        |       FROM (SELECT DISTINCT source, w FROM t)),
        |b AS (SELECT t.*, CAST((9000 * w) // denom AS BIGINT) AS budget
        |      FROM t CROSS JOIN dn),
        |c AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |      FROM b)
        |SELECT doc_id, source, n_tok, cum, budget
        |FROM c WHERE cum <= budget ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val t = Tables.documents(s, d).select(
        col("doc_id"),
        col("source"),
        size(split(col("text"), " ")).as("n_tok"),
        when(expr("CAST(substring(source, 4, 18) AS INT) % 2 = 0"), 2L).otherwise(1L).as("w"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)").as("h"),
      )
      val denom = t.select("source", "w").distinct().agg(sum("w").as("denom"))
      val wCum = Window.partitionBy("source").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.crossJoin(broadcast(denom))
        .withColumn("budget", expr("(9000 * w) div denom"))
        .withColumn("cum", sum("n_tok").over(wCum))
        .where(col("cum") <= col("budget"))
        .select("doc_id", "source", "n_tok", "cum", "budget")
        .orderBy("doc_id")
    },

    // ----- the STREAMING form of mix_token_budget, oracled end to end:
    // documents arrive as two micro-batches (split by doc_id parity —
    // any arrival split works), each screened by
    // DocumentStream.sampleToBudgetBatch against a persisted per-source
    // taken-tokens state (versioned per batchId, replay-idempotent —
    // MixBudgetStreamSpec covers the crash/replay matrix; this query
    // certifies the VALUES). Within a batch the take-while runs in md5
    // order from the carried offset; across batches only KEPT tokens
    // carry, so a source's budget can re-open for smaller late docs.
    // The oracle replays both batches as chained window CTEs.
    Q(
      "mix_token_budget_stream",
      """WITH t AS (SELECT doc_id, source,
        |                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
        |                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h,
        |                  doc_id % 2 AS batch
        |           FROM documents),
        |c1 AS (SELECT *, CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM t WHERE batch = 0),
        |k1 AS (SELECT * FROM c1 WHERE cum <= 450),
        |taken AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS t0 FROM k1 GROUP BY source),
        |c2 AS (SELECT t.*, COALESCE(tk.t0, 0) +
        |              CAST(sum(n_tok) OVER (PARTITION BY t.source ORDER BY h, doc_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |       FROM t LEFT JOIN taken tk ON t.source = tk.source
        |       WHERE t.batch = 1),
        |k2 AS (SELECT * FROM c2 WHERE cum <= 450)
        |SELECT doc_id, source, n_tok, cum FROM k1
        |UNION ALL SELECT doc_id, source, n_tok, cum FROM k2
        |ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val statePath = java.nio.file.Files.createTempDirectory("mix-stream-q").toFile.getAbsolutePath
      val docs = Tables.documents(s, d)
      val b0 = docs.where(col("doc_id") % 2 === 0)
      val b1 = docs.where(col("doc_id") % 2 === 1)
      val k1 = graft.streaming.DocumentStream
        .sampleToBudgetBatch(b0, statePath, 0L, defaultBudget = 450L)
      val k2 = graft.streaming.DocumentStream
        .sampleToBudgetBatch(b1, statePath, 1L, defaultBudget = 450L)
      k1.unionByName(k2).orderBy("doc_id")
    },

    // ----- balanced shard export: assign docs to 4 training shards,
    // balancing token mass, deterministically. Within each source, docs
    // order by token count DESC (ties by doc_id) and deal out in snake
    // order (0,1,2,3,3,2,1,0,…) — the classic sorted-serpentine
    // schedule, within 1 largest-item of even token mass per shard
    // without any sequential bin state. Per-source windows keep the
    // plan one shuffle on the ingest partitioning (no global sort, no
    // single-partition window), and per-source snakes compose: shard
    // totals stay balanced when sources union. Pure integer arithmetic
    // end to end.
    Q(
      "export_shards",
      """WITH t AS (SELECT doc_id, source,
        |                  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok
        |           FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY source
        |                                   ORDER BY n_tok DESC, doc_id) - 1 AS pos
        |      FROM t)
        |SELECT doc_id, source, n_tok,
        |       CAST(CASE WHEN pos % 8 < 4 THEN pos % 8 ELSE 7 - (pos % 8) END AS INTEGER) AS shard
        |FROM r ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      snakeShards(
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), size(split(col("text"), " ")).as("n_tok")),
        nShards = 4,
      )
        .select("doc_id", "source", "n_tok", "shard")
        .orderBy("doc_id")
    },

    // ----- weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    // A-Res): 100 docs drawn with probability proportional to token
    // count, via hash-derived uniforms so the draw is a pure function of
    // (corpus, seed). no_oracle: the ln(u)/w key is transcendental and
    // cross-engine float ordering near ties is not contractual —
    // WeightedSampleSpec pins determinism, WOR-ness, the w≤0 domain
    // rule, and k=1 inclusion frequencies against binomial bounds
    // (the roadmap's distribution-witness pattern). Plan shape:
    // TakeOrderedAndProject — per-task top-k, only k·tasks rows move.
    Q.noOracle("sample_weighted") { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("weight", size(split(col("text"), " ")).cast("double"))
      graft.operators.WeightedSample
        .sample(docs, 100, col("doc_id"), col("weight"), seed = 42L)
        .select(col("doc_id"), col("lang"), col("weight"))
        .orderBy("doc_id")
    },
  )
}
