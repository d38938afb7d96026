package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training + application (ROADMAP 66 — the
  * loop around the oracled `vocab_bpe_merge` kernel; Sennrich et al.
  * 2016).
  *
  * Training never iterates over the corpus: the caller derives a
  * `(word, freq)` table once (corpus read exactly once, vocabulary-
  * sized output — at 100 TB that is ~10⁷ rows against 10¹² corpus
  * rows), and every merge iteration is one adjacent-pair count shuffle
  * over that table plus a 1-row collect of the argmax pair. The learned
  * model is the driver-side merge list (N pairs — broadcast-sized by
  * construction), and [[tokenize]] replays it in rank order over any
  * word table, which is exactly how the reference BPE applies its
  * merges.
  *
  * The per-word merge application is a left-to-right `aggregate` fold:
  * a freshly merged token is APPENDED and never re-matched as the left
  * half within the same pass, so "aaaa" under (a,a) becomes [aa, aa] —
  * the non-overlap rule. BpeTokenizerSpec pins the whole loop (merge
  * sequence AND final symbol tables) against a sequential reference
  * implementation, and the first learned merge against the oracled
  * kernel query.
  */
object BpeTokenizer {

  /** One merge (x, y) applied left-to-right inside a symbol array. */
  private[operators] def applyMerge(syms: Column, x: String, y: String): Column =
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      array(element_at(syms, 1)),
      (acc, s) =>
        when(
          element_at(acc, -1) === lit(x) && s === lit(y),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(x + y))),
        ).otherwise(concat(acc, array(s))),
    )

  /** Lazy localCheckpoint that also returns the REGISTERED block
    * rdd(s), so the training loop can free superseded generations
    * deterministically. A checkpointed Dataset exposes no public
    * handle to its storage (unpersist() routes through the cache
    * manager and misses it) — without this, an N-merge run leaves N
    * registered RDDs behind until GC, which the suite's
    * no-lingering-cache gate rightly rejects. The diff is scoped to
    * this single call; the training loop is a sequential driver loop,
    * so nothing else registers inside the window.
    */
  private def checkpointTracked(df: DataFrame): (DataFrame, Seq[org.apache.spark.rdd.RDD[_]]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet
    // LAZY localCheckpoint (r21): lineage truncation and block tracking
    // are identical (persist registers at call time), but the
    // materialization rides the NEXT iteration's pair-count job — whose
    // TakeOrdered action computes every partition anyway — instead of
    // costing a dedicated job per merge. An N-merge training run is N
    // fewer sequential Spark jobs; values are unchanged (the same plan
    // materializes, one action later).
    val out = df.localCheckpoint(false)
    val created = sc.getPersistentRDDs.collect { case (id, r) if !before.contains(id) => r }.toSeq
    (out, created)
  }

  private def pairCounts(syms: DataFrame): DataFrame =
    syms
      .select(
        col("freq"),
        explode(
          when(
            size(col("syms")) >= 2,
            expr("transform(sequence(1, size(syms) - 1), i -> struct(syms[i-1] AS a, syms[i] AS b))"),
          ).otherwise(expr("array()")),
        ).as("p"),
      )
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").as("cnt"))

  /** Learn up to `nMerges` merges from a `(word, freq)` table. Stops
    * early when no adjacent pair remains. Ties break (count desc, left
    * asc, right asc) — deterministic, matching the oracled kernel.
    */
  def train(words: DataFrame, nMerges: Int): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // cache WITHOUT a materializing count() (r21): iteration 1's
    // pair-count action computes every partition anyway and fills the
    // cache as a side effect — the dedicated count job was one more
    // sequential driver round-trip per training run for nothing
    var syms = words
      .select(col("freq"), split(col("word"), "").as("syms"))
      .cache()
    var blocks: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    // Storage superseded by the CURRENT (lazily checkpointed, so not
    // yet materialized) generation: with a lazy checkpoint, freeing the
    // previous generation immediately would force — or, for an already
    // truncated local checkpoint, BREAK — recomputation when the
    // current one finally materializes. Freed at the top of the next
    // loop turn, right after the pair-count action has materialized it.
    var freeAfterAction: Seq[() => Unit] = Nil
    try {
      var exhausted = false
      while (merges.size < nMerges && !exhausted) {
        val best = pairCounts(syms)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(1)
          .collect()
        // that action materialized `syms` — its predecessors can go now
        freeAfterAction.foreach(_.apply())
        freeAfterAction = Nil
        if (best.isEmpty) exhausted = true
        else {
          val (x, y) = (best.head.getString(0), best.head.getString(1))
          merges += ((x, y))
          // localCheckpoint, not cache: an N-deep chain of cached plans
          // keeps every predecessor's plan reachable (InMemoryRelation
          // holds its child), so a real-vocabulary run grows the driver
          // heap linearly in N and dies around a few hundred merges —
          // the checkpoint truncates lineage, so iteration memory is
          // O(1) in merge count (the ConnectedComponents loop
          // discipline). At most two generations of blocks are ever
          // live, exactly as under the old eager scheme.
          val (next, newBlocks) = checkpointTracked(
            syms.withColumn("syms", applyMerge(col("syms"), x, y)))
          val (prev, prevBlocks) = (syms, blocks)
          freeAfterAction = Seq(() => {
            prev.unpersist() // frees generation 0's cache; no-op afterwards
            prevBlocks.foreach(_.unpersist(false))
            ()
          })
          blocks = newBlocks
          syms = next
        }
      }
      merges.toSeq
    } finally {
      freeAfterAction.foreach(_.apply())
      syms.unpersist()
      blocks.foreach(_.unpersist(false))
      ()
    }
  }

  /** Apply a rank-ordered merge batch to a symbol table in ONE typed
    * pass (no nested expression tree — the [[tokenizeKernel]] loop on
    * symbol arrays), preserving `(freq, syms)` shape.
    */
  private def applyBatch(syms: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = syms.sparkSession
    import spark.implicits._
    val mergesB = spark.sparkContext.broadcast(merges.toArray)
    syms.select(col("freq").cast("long"), col("syms"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ms = mergesB.value
        it.map { case (f, s0) =>
          var arr = s0.toArray
          var i = 0
          while (i < ms.length && arr.length > 1) {
            val (x, y) = ms(i)
            var j = 0
            var occurs = false
            while (j < arr.length - 1 && !occurs) {
              if (arr(j) == x && arr(j + 1) == y) occurs = true
              j += 1
            }
            if (occurs) {
              val out = scala.collection.mutable.ArrayBuffer(arr(0))
              var k = 1
              while (k < arr.length) {
                val s = arr(k)
                if (out.last == x && s == y) out(out.length - 1) = x + y
                else out += s
                k += 1
              }
              arr = out.toArray
            }
            i += 1
          }
          (f, arr.toSeq)
        }
      }
      .toDF("freq", "syms")
  }

  /** Batched training (ROADMAP: the 32k-merge scale path): learn up to
    * `batch` merges per pair-count SHUFFLE instead of one — a real
    * vocabulary costs ~nMerges/batch Spark jobs over the
    * vocabulary-sized table rather than nMerges sequential jobs.
    *
    * One ranked pair list per round; candidates are accepted greedily
    * in rank order while SYMBOL-DISJOINT from every pair already
    * accepted this round (neither side equal to an accepted side or an
    * accepted fused token) — disjoint merges commute, so applying an
    * accepted pair cannot change any other accepted pair's count, and
    * a conflicting candidate is simply DEFERRED to the next round's
    * recount (the documented conflict rule). What batching trades is
    * mid-round visibility of brand-new pairs: a pair involving a token
    * fused THIS round (e.g. (x, ab) right after (a, b)) cannot be
    * learned until the next recount, so where such a pair would
    * out-count a lower-ranked accepted pair, the learned ORDER can
    * differ from [[train]]'s. `batch = 1` is exactly [[train]];
    * corpora whose merges spawn no higher-count fused-token neighbors
    * (e.g. two-symbol words, or well-separated pair mass) batch
    * LOSSLESSLY — BpeTokenizerSpec pins both, and BpeBench prices the
    * N=256 ladder.
    */
  def trainBatched(words: DataFrame, nMerges: Int, batch: Int): Seq[(String, String)] = {
    require(nMerges >= 0, "nMerges must be non-negative")
    require(batch >= 1, "batch must be at least 1")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // lazy cache fill, as in [[train]] (r21): round 1's ranked pair-count
    // action materializes every partition
    var syms = words
      .select(col("freq"), split(col("word"), "").as("syms"))
      .cache()
    var blocks: Seq[org.apache.spark.rdd.RDD[_]] = Nil
    // same deferred-free discipline as [[train]]: lazily checkpointed
    // generations free their predecessor only after the next pair-count
    // action has materialized them
    var freeAfterAction: Seq[() => Unit] = Nil
    try {
      var exhausted = false
      while (merges.size < nMerges && !exhausted) {
        val want = math.min(batch, nMerges - merges.size)
        // rank headroom: conflicting candidates are skipped, so fetch
        // more than one round can accept; anything deferred re-ranks
        // next round with fresh counts
        val ranked = pairCounts(syms)
          .orderBy(col("cnt").desc, col("a"), col("b"))
          .limit(want * 4 + 4)
          .collect()
        freeAfterAction.foreach(_.apply())
        freeAfterAction = Nil
        if (ranked.isEmpty) exhausted = true
        else {
          val used = scala.collection.mutable.Set.empty[String]
          val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
          val it = ranked.iterator
          while (accepted.size < want && it.hasNext) {
            val r = it.next()
            val (x, y) = (r.getString(0), r.getString(1))
            if (!used(x) && !used(y)) {
              accepted += ((x, y))
              used ++= Seq(x, y, x + y)
            }
          }
          // the top-ranked pair never conflicts (used starts empty), so
          // progress is guaranteed whenever any pair remains
          merges ++= accepted
          // same lineage-truncating tracked checkpoint as [[train]]'s
          // loop — a 32k-merge vocabulary at batch=32 is still 1000
          // rounds, and each round's blocks free one action after being
          // superseded
          val (next, newBlocks) = checkpointTracked(applyBatch(syms, accepted.toSeq))
          val (prev, prevBlocks) = (syms, blocks)
          freeAfterAction = Seq(() => {
            prev.unpersist()
            prevBlocks.foreach(_.unpersist(false))
            ()
          })
          blocks = newBlocks
          syms = next
        }
      }
      merges.toSeq
    } finally {
      freeAfterAction.foreach(_.apply())
      syms.unpersist()
      blocks.foreach(_.unpersist(false))
      ()
    }
  }

  /** Apply a learned merge list in rank order: `words(word, ...)` gains
    * a `tokens` array column. The N folds NEST over the word table —
    * plan-linear in N, fine at demo merge counts, but Catalyst cannot
    * plan a real vocabulary's 32k-deep expression tree: use
    * [[tokenizeKernel]] past a few dozen merges.
    */
  def tokenize(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val start = words.withColumn("tokens", split(col("word"), ""))
    merges.foldLeft(start) { case (df, (x, y)) =>
      df.withColumn("tokens", applyMerge(col("tokens"), x, y))
    }
  }

  /** The corpus-scale form of [[tokenize]]: replay the merge list in
    * rank order with a per-word LOOP inside `mapPartitions` — the merge
    * list is broadcast (the model is driver-sized by construction), the
    * expression tree is gone, and N merges cost O(N · |word|) local
    * work per DISTINCT word. Each merge pass is the exact left-to-right
    * append-or-fuse of [[applyMerge]] (a fused token is never
    * re-matched as the left half within its own pass), so the kernel
    * equals the fold wherever the fold can run — BpeTokenizerSpec pins
    * kernel ≡ fold at N=8 and kernel ≡ the sequential reference at
    * N=1000, where the fold cannot plan. Returns `(word, tokens)`;
    * callers join it back to the corpus (vocabulary-sized build side —
    * see the `corpus_bpe_tokenize` query).
    */
  def tokenizeKernel(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val mergesB = spark.sparkContext.broadcast(merges.toArray)
    words
      .select(col("word"))
      .as[String]
      .mapPartitions { it =>
        val ms = mergesB.value
        it.map { w =>
          var syms: Array[String] = w.split("")
          var i = 0
          while (i < ms.length && syms.length > 1) {
            val (x, y) = ms(i)
            // pre-scan: most merges never touch a given word — skip the
            // rebuild unless the pair actually occurs
            var j = 0
            var occurs = false
            while (j < syms.length - 1 && !occurs) {
              if (syms(j) == x && syms(j + 1) == y) occurs = true
              j += 1
            }
            if (occurs) {
              val out = scala.collection.mutable.ArrayBuffer(syms(0))
              var k = 1
              while (k < syms.length) {
                val s = syms(k)
                if (out.last == x && s == y) out(out.length - 1) = x + y
                else out += s
                k += 1
              }
              syms = out.toArray
            }
            i += 1
          }
          (w, syms.toSeq)
        }
      }
      .toDF("word", "tokens")
  }
}
