package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Retrieval-side operators over the `documents` table: BM25 scoring,
  * frequency-ranked vocabulary construction, and inverted-index build.
  * A training-data pipeline uses these for corpus search (dedup triage,
  * contamination forensics) and for tokenizer/vocab prep.
  *
  * Float discipline: BM25 sums per-term contributions in a FIXED
  * expression tree (term1 + term2 + term3), never through a float
  * aggregate — aggregation order varies with partitioning, a fixed tree
  * does not. The only transcendental (`ln`) gets the repo's round(…, 6)
  * safety (off-grid, tie mass ~0). Everything else is integer counts.
  */
object SearchQueries {

  /** The oracle's literal search query — fixture-vocabulary words. */
  private val terms = Seq("spark", "merge", "window")

  // BM25 constants, written identically in both engines' SQL:
  // k1 = 1.2, b = 0.75 → k1+1 = 2.2, 1-b = 0.25.
  private[graft] def contribSql(tf: String, df: String) =
    s"ln((n - $df + 0.5) / ($df + 0.5) + 1) * ($tf * 2.2) / ($tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))"

  /** BM25 scoring over `documents` for a caller-supplied term list
    * (defaulted to the oracle's fixture terms — the registered
    * `bm25_search` query runs this with the default). Terms land in the
    * plan as literals; the corpus side never shuffles for them, so any
    * term count keeps the same two-shuffle shape: per-doc tf/dl from
    * ONE explode+groupBy pass, global stats as ONE single-row aggregate
    * broadcast back. Per-term contributions sum in a FIXED expression
    * tree (left fold), never a float aggregate — the summation order is
    * independent of partitioning.
    */
  def bm25(s: SparkSession, d: String, queryTerms: Seq[String] = terms): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val n = queryTerms.size
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      count(when(col("word") === t, 1)).as(s"tf${i + 1}")
    }
    val tf = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val gCols = Seq(
      count(lit(1)).cast("double").as("n"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
    ) ++ (1 to n).map(i => count(when(col(s"tf$i") > 0, 1)).cast("double").as(s"df$i"))
    val g = tf.agg(gCols.head, gCols.tail: _*)
    val anyHit = (1 to n).map(i => col(s"tf$i")).reduce(_ + _) > 0
    val score = (1 to n).map(i => expr(contribSql(s"tf$i", s"df$i"))).reduce(_ + _)
    val outCols = col("doc_id") +:
      (1 to n).map(i => col(s"tf$i").cast("int").as(s"tf$i")) :+
      round(score, 6).as("bm25")
    tf.crossJoin(broadcast(g))
      .where(anyHit)
      .select(outCols: _*)
      .orderBy(desc("bm25"), col("doc_id"))
  }

  /** The full-corpus BM25 oracle — shared by `bm25_search` and
    * `bm25_indexed` (a probe of a complete index IS the one-shot
    * query, so the same SQL pins both), parameterized by a corpus
    * predicate for `bm25_cdc_sync` (whose index holds the leaf's
    * CURRENT live rows — the post-delete corpus).
    */
  private def bm25SqlWhere(where: String): String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents$where),
       |tf AS (SELECT doc_id, count(*) AS dl,
       |              count(CASE WHEN word = '${terms(0)}' THEN 1 END) AS tf1,
       |              count(CASE WHEN word = '${terms(1)}' THEN 1 END) AS tf2,
       |              count(CASE WHEN word = '${terms(2)}' THEN 1 END) AS tf3
       |       FROM w GROUP BY doc_id),
       |g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
       |             CAST(count(CASE WHEN tf1 > 0 THEN 1 END) AS DOUBLE) AS df1,
       |             CAST(count(CASE WHEN tf2 > 0 THEN 1 END) AS DOUBLE) AS df2,
       |             CAST(count(CASE WHEN tf3 > 0 THEN 1 END) AS DOUBLE) AS df3
       |      FROM tf)
       |SELECT doc_id, CAST(tf1 AS INTEGER) AS tf1, CAST(tf2 AS INTEGER) AS tf2,
       |       CAST(tf3 AS INTEGER) AS tf3,
       |       round(${contribSql("tf1", "df1")} + ${contribSql("tf2", "df2")}
       |             + ${contribSql("tf3", "df3")}, 6) AS bm25
       |FROM tf CROSS JOIN g
       |WHERE tf1 + tf2 + tf3 > 0
       |ORDER BY bm25 DESC, doc_id""".stripMargin

  private val bm25Sql = bm25SqlWhere("")

  /** Two-stage retrieval oracle (retrieve-then-rerank): BM25 cuts the
    * corpus to K=50 candidates, a deterministic "cross-encoder"
    * stand-in re-scores them (log-saturated term hits damped by
    * log-length). `cutScore` is the candidate-cut ordering expression:
    * the one-shot path ranks raw scores, the index probe ranks its
    * public ROUNDED score — each Spark path mirrored exactly.
    */
  private def rerankSql(cutScore: String): String =
    s"""WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
       |tf AS (SELECT doc_id, count(*) AS dl,
       |              count(CASE WHEN word = '${terms(0)}' THEN 1 END) AS tf1,
       |              count(CASE WHEN word = '${terms(1)}' THEN 1 END) AS tf2,
       |              count(CASE WHEN word = '${terms(2)}' THEN 1 END) AS tf3
       |       FROM w GROUP BY doc_id),
       |g AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
       |             CAST(count(CASE WHEN tf1 > 0 THEN 1 END) AS DOUBLE) AS df1,
       |             CAST(count(CASE WHEN tf2 > 0 THEN 1 END) AS DOUBLE) AS df2,
       |             CAST(count(CASE WHEN tf3 > 0 THEN 1 END) AS DOUBLE) AS df3
       |      FROM tf),
       |scored AS (SELECT doc_id, tf1, tf2, tf3, dl,
       |                  ${contribSql("tf1", "df1")} + ${contribSql("tf2", "df2")}
       |                  + ${contribSql("tf3", "df3")} AS bm25
       |           FROM tf CROSS JOIN g WHERE tf1 + tf2 + tf3 > 0),
       |cand AS (SELECT * FROM (SELECT *, row_number() OVER (ORDER BY $cutScore DESC, doc_id) AS rn
       |                        FROM scored) WHERE rn <= 50)
       |SELECT doc_id, round(bm25, 6) AS bm25,
       |       round((ln(1 + tf1) + ln(1 + tf2) + ln(1 + tf3)) / (1 + ln(1 + dl)), 6) AS ce
       |FROM cand
       |ORDER BY (ln(1 + tf1) + ln(1 + tf2) + ln(1 + tf3)) / (1 + ln(1 + dl)) DESC, doc_id
       |LIMIT 10""".stripMargin

  /** Rank-based candidate cut (row_number <= k over score DESC, doc_id)
    * — Spark executes it as a map-side WindowGroupLimit, not a
    * single-partition sort. Expects a `bm25` column.
    */
  private def candidateCut(scored: DataFrame, k: Int): DataFrame = {
    val wCut = org.apache.spark.sql.expressions.Window.orderBy(desc("bm25"), col("doc_id"))
    scored.withColumn("rn", row_number().over(wCut)).where(col("rn") <= k)
  }

  /** The inference boundary of the rerank stage: candidates buffered
    * into fixed-size batches of 32 inside mapPartitions, one "model
    * call" per batch — the batched-inference pattern a real pipeline
    * points at a model server (the multimodal family's codec-boundary
    * discipline applied to retrieval). The scorer is a deterministic
    * stand-in so the composition stays ORACLED; swap `scoreBatch` for a
    * real encoder without touching the plan shape (java.lang.Math.log
    * == Spark SQL ln == DuckDB ln on these well-conditioned integer
    * inputs, within the round-6 discipline). The rerank touches K rows
    * total — at 100 TB the cut does the work and the boundary's cost is
    * the model call, not a shuffle.
    */
  private def ceRerank(s: SparkSession, cand: DataFrame): DataFrame = {
    import s.implicits._
    val typed = cand
      .select(col("doc_id").cast("long").as("_1"), col("bm25").cast("double").as("_2"),
        col("tf1").cast("long").as("_3"), col("tf2").cast("long").as("_4"),
        col("tf3").cast("long").as("_5"), col("dl").cast("long").as("_6"))
      .as[(Long, Double, Long, Long, Long, Long)]
    def scoreBatch(batch: Seq[(Long, Double, Long, Long, Long, Long)]) =
      batch.map { case (id, bm, t1, t2, t3, dl) =>
        val ce = (math.log(1.0 + t1) + math.log(1.0 + t2) + math.log(1.0 + t3)) /
          (1.0 + math.log(1.0 + dl))
        (id, bm, ce)
      }
    typed.mapPartitions(_.grouped(32).flatMap(scoreBatch))
      .toDF("doc_id", "bm25", "ce")
      .orderBy(desc("ce"), col("doc_id"))
      .limit(10)
      .select(col("doc_id"), round(col("bm25"), 6).as("bm25"), round(col("ce"), 6).as("ce"))
  }

  val qs: Seq[Q] = Seq(

    // ----- BM25 search: per-doc term frequencies and document length
    // from ONE explode+groupBy pass (a single shuffle on doc_id); the
    // global stats (N, avgdl, per-term df) are ONE single-row aggregate
    // over that result, broadcast back. At 100 TB the per-doc relation
    // is corpus-sized but the scoring join is against a 1-row broadcast;
    // nothing quadratic, nothing re-shuffled.
    Q("bm25_search", bm25Sql) { (s, d) => bm25(s, d) },

    // ----- BM25 over the PERSISTED inverted index: the probe path.
    // operators.IndexStore keeps postings hive-partitioned by term
    // hash bucket with cumulative stats per sealed generation; a query
    // reads only its terms' tb= partitions (static partition filter)
    // and re-derives scores from (tf, dl) + current stats — so the
    // probe of a complete index equals the one-shot bm25_search
    // bit-for-bit (same integers, same expression tree) and the SAME
    // oracle pins it. The store comes from the per-corpus StoreCache:
    // this query prices the PROBE; build cost is the one-time ingest.
    // IndexStoreSpec pins append/compact equivalence and the pruned
    // scan.
    Q("bm25_indexed", bm25Sql) { (s, d) =>
      val path = StoreCache.resolve(d, "bm25-index", table = "documents") { p =>
        graft.operators.IndexStore.build(s, Tables.documents(s, d), p)
        ()
      }
      graft.operators.IndexStore.search(s, path, terms)
    },

    // ----- the CDC consumer composition, end to end: a manifest leaf
    // ingested through the WAP gate, COMPACTED (walk-verified net-zero
    // — the index sync advances its cursor with ZERO index work), then
    // hit with a ManifestCommit.deleteWhere retention delete; the
    // inverted index follows the leaf purely through
    // IndexStore.syncFromLeaf (ChangeFeed appended→additions,
    // removed→tombstones, cursor sealed with each generation). The
    // probe must equal the one-shot BM25 over the leaf's CURRENT rows
    // — the oracle is the same SQL with the delete's predicate, so a
    // single hash match certifies the whole chain: gate, feed,
    // tombstone scoring (n/avgdl/df all move), and that the pure
    // compaction added nothing. Deletions tombstone doc lengths too,
    // so every survivor's score shifts — a stale stats read would
    // hash-mismatch.
    Q("bm25_cdc_sync", bm25SqlWhere(" WHERE doc_id % 10 <> 0")) { (s, d) =>
      import graft.compact.{CommitMode, CompactorConfig, LeafPlan, ManifestCommit, Merger, WapCommit}
      val path = StoreCache.resolve(d, "bm25-cdc-mor", table = "documents") { p =>
        // stateful two-phase build: stage whole, publish by rename
        // (the dedup_cluster_rep_inc discipline — a crashed half-build
        // must never register as built)
        val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)
        val stage = new org.apache.hadoop.fs.Path(p + ".stage")
        fs.delete(stage, true)
        val leaf = s"$stage/leaf"
        val idx = s"$stage/index"
        val cfg = CompactorConfig(commitMode = CommitMode.Manifest, retainSuperseded = true)
        val gate = Seq(WapCommit.AuditCheck.notNull("doc_id"))
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val half = expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 2")
        WapCommit.writeAuditPublish(s, leaf, docs.where(half === 0), gate, cfg)
        graft.operators.IndexStore.syncFromLeaf(s, leaf, idx) // bootstrap
        WapCommit.writeAuditPublish(s, leaf, docs.where(half === 1), gate, cfg)
        graft.operators.IndexStore.syncFromLeaf(s, leaf, idx) // arrival
        val live = ManifestCommit.liveFiles(s, leaf)
        val bytes = live.map(f => new java.io.File(f).length).sum
        Merger.mergeAndCommit(s, LeafPlan(leaf, "fold", live, bytes), cfg)
        graft.operators.IndexStore.syncFromLeaf(s, leaf, idx) // net-zero walk
        // retention delete through the MERGE-ON-READ path: the commit is
        // one position sidecar (no data rewrite); the feed's `deleted`
        // term retracts exactly those rows into tombstones
        ManifestCommit.deleteWhereMoR(s, leaf, col("doc_id") % 10 === 0, cfg)
        graft.operators.IndexStore.syncFromLeaf(s, leaf, idx) // sidecar retractions
        // ... and the next compaction folds the sidecar physically — a
        // walk-verified net-zero window, so this sync advances the
        // cursor with zero index work (the probe certifies both states)
        val live2 = ManifestCommit.liveFiles(s, leaf)
        val bytes2 = live2.map(f => new java.io.File(f).length).sum
        ManifestCommit.mergeAndCommit(s, LeafPlan(leaf, "fold2", live2, bytes2), cfg)
        graft.operators.IndexStore.syncFromLeaf(s, leaf, idx) // net-zero sidecar fold
        fs.create(new org.apache.hadoop.fs.Path(s"$stage/_current-done"), true).close()
        if (!fs.rename(stage, new org.apache.hadoop.fs.Path(p)))
          throw new java.io.IOException(s"bm25-cdc store publish rename failed: $stage -> $p")
      }
      graft.operators.IndexStore.search(s, s"$path/index", terms)
    },

    // ----- two-stage retrieval (retrieve-then-rerank — the production
    // search/RAG shape): BM25 cuts the corpus to K=50 candidates, then
    // a "cross-encoder" re-scores each (query, doc) pair inside a
    // BATCHED mapPartitions boundary — rows buffered into fixed-size
    // batches of 32, scored, emitted — the batched-inference pattern a
    // real pipeline points at a model server (the multimodal family's
    // codec-boundary discipline applied to retrieval). The scorer is a
    // deterministic stand-in (log-saturated term hits damped by
    // log-length, java.lang.Math arithmetic == Spark SQL's) so the
    // whole composition stays ORACLED. The corpus pays ONE scan (the
    // tf pass); the rerank touches K rows total — at 100 TB the cut
    // does the work and the boundary's cost is the model call, not a
    // shuffle. The candidate cut is rank-based (row_number <= K,
    // bm25 DESC, doc_id), which Spark executes as a map-side
    // WindowGroupLimit, not a single-partition sort.
    Q("bm25_rerank", rerankSql(cutScore = "bm25")) { (s, d) =>
      val n = terms.size
      val tfCols = terms.zipWithIndex.map { case (t, i) =>
        count(when(col("word") === t, 1)).as(s"tf${i + 1}")
      }
      val tf = Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("dl"), tfCols: _*)
      val gCols = Seq(
        count(lit(1)).cast("double").as("n"),
        (sum("dl").cast("double") / count(lit(1))).as("avgdl"),
      ) ++ (1 to n).map(i => count(when(col(s"tf$i") > 0, 1)).cast("double").as(s"df$i"))
      val g = tf.agg(gCols.head, gCols.tail: _*)
      val anyHit = (1 to n).map(i => col(s"tf$i")).reduce(_ + _) > 0
      val score = (1 to n).map(i => expr(contribSql(s"tf$i", s"df$i"))).reduce(_ + _)
      val scored = tf.crossJoin(broadcast(g))
        .where(anyHit)
        .withColumn("bm25", score)
      ceRerank(s, candidateCut(scored, k = 50))
    },

    // ----- the same two-stage retrieval, FULLY incremental: stage one
    // is [[graft.operators.IndexStore.search]] over the persisted
    // inverted index (terms' tb= partitions only, probe-priced via the
    // per-corpus StoreCache — the store is SHARED with bm25_indexed,
    // built once for both), stage two the identical batched-inference
    // rerank boundary. A probe of a complete index carries the same
    // integers as the one-shot pass, so the same oracle machinery pins
    // the whole composition — the only delta is the candidate cut
    // ordering on the probe's ROUNDED bm25 (the probe's public score),
    // mirrored exactly in the SQL. This is the production RAG stack:
    // ingest appends to the index, queries pay probe + K model calls,
    // nothing rescans the corpus.
    Q("bm25_rerank_indexed", rerankSql(cutScore = "round(bm25, 6)")) { (s, d) =>
      val path = StoreCache.resolve(d, "bm25-index", table = "documents") { p =>
        graft.operators.IndexStore.build(s, Tables.documents(s, d), p)
        ()
      }
      val scored = graft.operators.IndexStore.search(s, path, terms, withDl = true)
      ceRerank(s, candidateCut(scored, k = 50))
    },

    // ----- vocabulary build: frequency-ranked token ids (BPE-prep /
    // embedding-table layout). The id assignment is a TOTAL order over
    // the vocab, realized as a distributed range-partitioned sort +
    // zipWithIndex — not a single-partition window. The sort is over the
    // VOCAB (distinct terms), which is orders of magnitude smaller than
    // the corpus; min_count=2 drops hapax legomena the way real vocab
    // builds do.
    Q(
      "vocab_build",
      """WITH c AS (SELECT word, count(*) AS n
        |           FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |           GROUP BY word HAVING count(*) >= 2)
        |SELECT word, n, CAST(row_number() OVER (ORDER BY n DESC, word) AS INTEGER) AS token_id
        |FROM c ORDER BY token_id""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val counts = Tables.fanout(Tables.documents(s, d))
        .select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= 2)
      // orderBy range-partitions; zipWithIndex preserves the global
      // order across partitions — the scalable form of an unpartitioned
      // row_number() window (which would funnel the vocab to one task)
      counts.orderBy(desc("n"), col("word"))
        .rdd.zipWithIndex()
        .map { case (r, i) => (r.getString(0), r.getLong(1), (i + 1).toInt) }
        .toDF("word", "n", "token_id")
        .orderBy("token_id")
    },

    // ----- inverted index: term → document frequency + ordered posting
    // list. Posting lists materialize as sorted CSV strings so the
    // oracle comparison is a plain string equality. One shuffle on the
    // term; per-term state is the posting list itself (at 100 TB the
    // heavy tail is stopword terms — cap or bucket those postings; here
    // the df column is the dial a caller would cap on).
    Q(
      "text_inverted_index",
      """WITH wd AS (SELECT DISTINCT word, doc_id
        |            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents))
        |SELECT word, count(*) AS df,
        |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |FROM wd GROUP BY word ORDER BY word""".stripMargin,
    ) { (s, d) =>
      Tables.fanout(Tables.documents(s, d))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .distinct()
        .groupBy("word")
        .agg(
          count(lit(1)).as("df"),
          expr("concat_ws(',', transform(sort_array(collect_list(doc_id)), x -> CAST(x AS STRING)))")
            .as("postings"),
        )
        .orderBy("word")
    },
  )
}
