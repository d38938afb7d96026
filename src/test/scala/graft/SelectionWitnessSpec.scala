package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Semantic witnesses for the round-14 selection/export family. All
  * four queries are DuckDB-oracled (cross-engine value equality); these
  * pin the invariants the oracle can't express — balance bounds on any
  * input, prefix-closure of budget selections, and the MMR objective
  * verified by an independent recomputation.
  */
class SelectionWitnessSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The md5-order key the mix queries use (first 8 hex chars). */
  private def h(docId: Long): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  test("snake shards: per-source row counts within 1 and token mass within one largest item — seeded random + adversarial shapes") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(20260814L)
    val nShards = 4
    val cases: Seq[Seq[(Long, String, Int)]] =
      (0 until 6).map { _ =>
        val n = 1 + rnd.nextInt(80)
        (0 until n).map(i => (i.toLong, s"s${rnd.nextInt(3)}", 1 + rnd.nextInt(1000)))
      } ++ Seq(
        Seq((0L, "solo", 100)),                                  // single row: diff = max item, the boundary
        (0 until 9).map(i => (i.toLong, "eq", 50)),              // all equal
        (0 until 12).map(i => (i.toLong, "geo", 1 << (12 - i))), // geometric — the drift-adversarial shape
      )
    cases.foreach { rows =>
      val out = graft.queries.PipelineQueries
        .snakeShards(rows.toDF("doc_id", "source", "n_tok"), nShards)
        .select("source", "shard", "n_tok")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
      out.groupBy(_._1).foreach { case (src, members) =>
        val byShard = (0 until nShards).map(k => members.filter(_._2 == k))
        val counts = byShard.map(_.length)
        val sums = byShard.map(_.map(_._3.toLong).sum)
        val maxItem = members.map(_._3.toLong).max
        withClue(s"source $src (${members.length} rows): ") {
          counts.max - counts.min should be <= 1
          sums.max - sums.min should be <= maxItem
        }
      }
    }
  }

  test("mix_token_budget: the selection is a budget-respecting PREFIX of the md5 order, never a cherry-pick") {
    val out = SparkEntry.queries("mix_token_budget")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    out should not be empty
    // budgets respected: the last (max-cum) selected row per source is under budget
    out.groupBy(_._2).foreach { case (src, rows) =>
      withClue(s"source $src: ") {
        rows.map(_._4).max should be <= rows.head._5
      }
    }
    // prefix-closure: re-derive each source's hash order from the corpus;
    // the selected set must be exactly the maximal take-while prefix
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), expr("size(split(text, ' '))").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val selected = out.map(_._1).toSet
    docs.groupBy(_._2).foreach { case (src, rows) =>
      val budget = out.find(_._2 == src).map(_._5)
      budget.foreach { b =>
        var cum = 0L
        val expect = scala.collection.mutable.Set.empty[Long]
        var open = true
        rows.sortBy(r => (h(r._1), r._1)).foreach { case (id, _, n) =>
          cum += n
          if (open && cum <= b) expect += id else open = false
        }
        withClue(s"source $src: ") {
          out.filter(_._2 == src).map(_._1).toSet shouldBe expect.toSet
        }
      }
      // a source with NO selected row must have its first doc alone over budget —
      // cannot be asserted without the budget; covered by the oracle instead
      if (budget.isEmpty) succeed
    }
    selected should not be empty
  }

  test("select_mmr_diverse: picks verified by an independent greedy recomputation") {
    val out = SparkEntry.queries("select_mmr_diverse")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    def sim(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    (0L until 5L).foreach { qid =>
      val qv = vecs(qid)
      val pool = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, sim(v, qv), v) }
        .sortBy { case (id, rel, _) => (-rel, id) }
        .take(8)
      val picked = scala.collection.mutable.ArrayBuffer(pool.head)
      while (picked.size < 4) {
        val best = pool.filterNot(c => picked.exists(_._1 == c._1))
          .map(c => (c, 0.7 * c._2 - 0.3 * picked.map(p => sim(c._3, p._3)).max))
          .minBy { case (c, score) => (-score, c._1) }
        picked += best._1
      }
      val got = out.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      withClue(s"qid $qid: ") { got shouldBe picked.map(_._1).toSeq }
    }
  }

  test("text_compress_ratio: partition-independent, ordered repetitive < prose < random, bounded") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val repetitive = Seq.fill(200)("spark merge").mkString(" ")
    val prose = Seq.fill(200)(Seq("the", "quick", "brown", "fox", "jumps", "merge", "window", "scan")(rnd.nextInt(8))).mkString(" ")
    val random = Seq.fill(200)(rnd.alphanumeric.take(8).mkString).mkString(" ")
    // 50 copies of each text spread across partitions: a doc's ratio
    // must not depend on its partition-mates (per-row Deflater reset)
    val docs = (0 until 150).map { i =>
      val t = i % 3 match { case 0 => repetitive; case 1 => prose; case _ => random }
      (i.toLong, t, "en", s"src${i % 4}", t.length.toLong)
    }
    val dir = java.nio.file.Files.createTempDirectory("cr-docs").toFile.getAbsolutePath
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(7).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("text_compress_ratio")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    out should have length 150
    val byKind = out.groupBy(t => t._1 % 3).map { case (k, rs) => k -> rs.map(_._2).distinct }
    // identical texts → identical ratios, wherever they landed
    byKind.values.foreach(_ should have length 1)
    val Seq(rRep, rProse, rRand) = Seq(0L, 1L, 2L).map(k => byKind(k).head)
    rRep should be < rProse
    rProse should be < rRand
    out.foreach { case (_, r) => r should (be > 0.0 and be < 1.2) }
  }

  test("split_decontaminated: clean eval docs share no band with train; flagged ones demonstrably do") {
    val s = spark
    import s.implicits._
    val out = SparkEntry.queries("split_decontaminated")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(2)))
    out should not be empty
    val docs = Tables.documents(spark, sf)
    val bucket =
      expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 10")
    val bands = graft.queries.DedupQueries.minhashBands(s, docs)
      .join(docs.select(col("doc_id"), bucket.as("bucket")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    val trainBands = bands.filter(_._4 != 0L).map(b => (b._2, b._3)).toSet
    val evalBands = bands.filter(_._4 == 0L).groupBy(_._1)
      .map { case (id, bs) => id -> bs.map(b => (b._2, b._3)).toSet }
    out.foreach { case (id, leaky) =>
      val overlap = evalBands.get(id).exists(_.exists(trainBands.contains))
      withClue(s"doc $id: ") { (if (overlap) 1 else 0) shouldBe leaky }
    }
  }
}
