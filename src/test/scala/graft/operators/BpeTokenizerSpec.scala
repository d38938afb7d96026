package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

/** The distributed BPE loop must learn EXACTLY the merge sequence the
  * sequential reference algorithm learns (same tie rule), and tokenize
  * every word to the same symbol sequence — the differential test that
  * makes the iterated kernel trustworthy beyond the single oracled
  * step.
  */
class BpeTokenizerSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Sequential reference: classic get_stats + merge loop. */
  private def refTrain(
      words: Seq[(String, Long)],
      n: Int,
  ): (Seq[(String, String)], Map[String, Seq[String]]) = {
    var tab: Seq[(String, Seq[String], Long)] =
      words.map { case (w, f) => (w, w.split("").toSeq, f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    def applyRef(syms: Seq[String], x: String, y: String): Seq[String] =
      syms.tail.foldLeft(Vector(syms.head)) { (acc, s) =>
        if (acc.last == x && s == y) acc.init :+ (x + y) else acc :+ s
      }
    var stop = false
    while (merges.size < n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      tab.foreach { case (_, syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) += f
          case _ => ()
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        tab = tab.map { case (w, syms, f) => (w, applyRef(syms, best._1, best._2), f) }
      }
    }
    (merges.toSeq, tab.map { case (w, syms, _) => w -> syms }.toMap)
  }

  private def corpusWords = Tables.documents(spark, sf)
    .select(explode(split(col("text"), " ")).as("word"))
    .where(col("word") =!= "")
    .groupBy("word").agg(count(lit(1)).as("freq"))

  test("distributed training learns the reference merge sequence and tokenization, on real corpus words") {
    val words = corpusWords.cache()
    try {
      val wordFreqs = words.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val (refMerges, refTab) = refTrain(wordFreqs, 8)
      refMerges.size shouldBe 8 // the fixture has plenty of pair mass

      val merges = BpeTokenizer.train(words, nMerges = 8)
      merges shouldBe refMerges

      val toks = BpeTokenizer.tokenize(words.select("word"), merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      toks.keySet shouldBe refTab.keySet
      toks.foreach { case (w, syms) => withClue(w) { syms shouldBe refTab(w) } }
      // merges actually fuse symbols: some word tokenizes shorter than its chars
      toks.exists { case (w, syms) => syms.size < w.length } shouldBe true
    } finally { words.unpersist(); () }
  }

  test("the first learned merge equals the oracled single-step kernel's merge1") {
    // vocab_bpe_merge caps word length at 64 — corpus words here are
    // far shorter, so the tables agree; the cross-check pins the loop
    // to the DuckDB-verified kernel
    val q = graft.SparkEntry.queries("vocab_bpe_merge")(spark, sf)
    val merge1 = q.select("merge1").head().getString(0)
    val first = BpeTokenizer.train(corpusWords, nMerges = 1)
    first.map { case (x, y) => x + y } shouldBe Seq(merge1)
  }

  test("early stop: training on single-symbol words yields no merges") {
    val s = spark
    import s.implicits._
    val words = Seq(("a", 5L), ("b", 3L)).toDF("word", "freq")
    BpeTokenizer.train(words, nMerges = 4) shouldBe Seq.empty
  }

  test("tokenizeKernel equals the nested-fold tokenize at N=8, on real corpus words") {
    val words = corpusWords.cache()
    try {
      val merges = BpeTokenizer.train(words, nMerges = 8)
      val fold = BpeTokenizer.tokenize(words.select("word"), merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      val kernel = BpeTokenizer.tokenizeKernel(words, merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      kernel.keySet shouldBe fold.keySet
      kernel.foreach { case (w, syms) => withClue(w) { syms shouldBe fold(w) } }
    } finally { words.unpersist(); () }
  }

  test("tokenizeKernel replays a 1000-merge vocabulary — where the fold cannot plan") {
    val s = spark
    import s.implicits._
    // a deliberately APPLICABLE synthetic merge chain: tokens compose
    // out of earlier tokens over a 4-letter alphabet, so deep ranks
    // still fire on random words (a real vocabulary's shape)
    val rnd = new scala.util.Random(421)
    val pool = scala.collection.mutable.ArrayBuffer("a", "b", "c", "d")
    val merges = (1 to 1000).map { _ =>
      val x = pool(rnd.nextInt(math.min(pool.length, 40)))
      val y = pool(rnd.nextInt(math.min(pool.length, 40)))
      pool += (x + y)
      (x, y)
    }
    val words = (1 to 300).map { _ =>
      val len = 5 + rnd.nextInt(25)
      (Seq.fill(len)("abcd" (rnd.nextInt(4))).mkString, 1L)
    }.distinct
    // sequential reference: the same per-merge left-to-right pass
    def refApply(w: String): Seq[String] =
      merges.foldLeft(w.split("").toSeq) { case (syms, (x, y)) =>
        if (syms.length < 2) syms
        else
          syms.tail.foldLeft(Vector(syms.head)) { (acc, sym) =>
            if (acc.last == x && sym == y) acc.init :+ (x + y) else acc :+ sym
          }
      }
    val kernel = BpeTokenizer.tokenizeKernel(words.toDF("word", "freq"), merges)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    kernel.keySet shouldBe words.map(_._1).toSet
    kernel.foreach { case (w, syms) => withClue(w) { syms shouldBe refApply(w) } }
    // the deep ranks genuinely fired: some word compressed beyond what
    // any 8-merge prefix could do
    kernel.exists { case (w, syms) => syms.size <= w.length / 3 } shouldBe true
  }

  test("corpus tokenization: every in-vocabulary word occurrence expands to its trained symbols") {
    val q = graft.SparkEntry.queries("corpus_bpe_tokenize")(spark, sf)
    val words = corpusWords.cache()
    try {
      val merges = BpeTokenizer.train(words, nMerges = 8)
      val tokOf = BpeTokenizer.tokenizeKernel(words, merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      // reassembling each word position's tokens gives back the word
      val byWordPos = q.collect()
        .map(r => ((r.getLong(0), r.getInt(1)), (r.getInt(2), r.getString(3))))
        .groupBy(_._1)
        .map { case (k, rows) => k -> rows.map(_._2).sortBy(_._1).map(_._2) }
      val docs = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("wp", "word")))
        .where(col("word") =!= "" && org.apache.spark.sql.functions.length(col("word")) < 64)
        .collect().map(r => (r.getLong(0), r.getInt(1) + 1) -> r.getString(2)).toMap
      byWordPos.keySet shouldBe docs.keySet
      byWordPos.foreach { case (k, toks) =>
        withClue(s"$k ${docs(k)}") {
          toks.mkString shouldBe docs(k)
          toks shouldBe tokOf(docs(k))
        }
      }
    } finally { words.unpersist(); () }
  }

  // ---- batched training rounds ------------------------------------------

  test("trainBatched(batch=1) IS the sequential loop, merge for merge") {
    val words = corpusWords.cache()
    try {
      BpeTokenizer.trainBatched(words, nMerges = 6, batch = 1) shouldBe
        BpeTokenizer.train(words, nMerges = 6)
    } finally { words.unpersist(); () }
  }

  test("trainBatched is lossless where merges spawn no fused-token neighbors: two-symbol words") {
    val s = spark
    import s.implicits._
    // every word is exactly two symbols, so a merge collapses its word
    // to ONE token and can create no new adjacent pair — the batched
    // round sees exactly what sequential recounts would see
    val words = Seq(
      ("ab", 90L), ("cd", 70L), ("ef", 50L), ("gh", 30L), ("ij", 10L),
    ).toDF("word", "freq")
    val seq = BpeTokenizer.train(words, nMerges = 5)
    seq.size shouldBe 5
    BpeTokenizer.trainBatched(words, nMerges = 5, batch = 5) shouldBe seq
    BpeTokenizer.trainBatched(words, nMerges = 5, batch = 2) shouldBe seq
  }

  test("conflict rule: a candidate sharing a symbol with an accepted pair is DEFERRED, and the recount keeps the result sequential") {
    val s = spark
    import s.implicits._
    // top pair (a,b); runner-up (b,c) SHARES b — one round must accept
    // only (a,b) and defer (b,c) to the recount, where its true count
    // (after ab fused) decides. Words chosen so the recount's answer is
    // the sequential one.
    val words = Seq(
      ("ab", 100L), // pair (a,b) mass, two-symbol: fuses clean
      ("bc", 60L), // pair (b,c) mass
      ("de", 40L), // disjoint mass — batchable alongside (a,b)
    ).toDF("word", "freq")
    val seq = BpeTokenizer.train(words, nMerges = 3)
    seq shouldBe Seq(("a", "b"), ("b", "c"), ("d", "e"))
    val bat = BpeTokenizer.trainBatched(words, nMerges = 3, batch = 3)
    // round 1 accepts (a,b) then skips (b,c) [shares b] and accepts
    // (d,e); round 2 recounts and learns (b,c) — same SET, and the
    // deferral is visible as the order swap of the conflicted pair
    bat.toSet shouldBe seq.toSet
    bat shouldBe Seq(("a", "b"), ("d", "e"), ("b", "c"))
  }

  test("batched at N=64 on real corpus words: full vocabulary learned, applied tokenization round-trips") {
    val words = corpusWords.cache()
    try {
      val merges = BpeTokenizer.trainBatched(words, nMerges = 64, batch = 16)
      merges.size shouldBe 64
      merges.distinct.size shouldBe 64 // no pair learned twice
      // the learned model APPLIES: every tokenization reassembles its
      // word, and the fused vocabulary is actually used
      val toks = BpeTokenizer.tokenizeKernel(words, merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1))
      toks.foreach { case (w, syms) => withClue(w) { syms.mkString shouldBe w } }
      val fused = merges.map { case (x, y) => x + y }.toSet
      toks.flatMap(_._2).toSet.intersect(fused) should not be empty
    } finally { words.unpersist(); () }
  }
}
