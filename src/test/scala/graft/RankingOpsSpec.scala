package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.{GraphQueries, PipelineQueries}

/** Invariants of the round-4 operators that the DuckDB oracle gate
  * can't express: greedy packing never overflows the budget, the
  * distributed vocab-id assignment preserves the global order under
  * partition skew, and the oriented wedge-join triangle count agrees
  * with brute force on random graphs.
  */
class RankingOpsSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("packGreedy never overflows the budget except for solo oversize docs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42)
    val budget = 100
    val docs = (1L to 2000L).map { id =>
      val lang = s"l${rnd.nextInt(5)}"
      // mostly small docs, some oversize (> budget) to hit the solo-pack path
      val n = if (rnd.nextInt(20) == 0) budget + 1 + rnd.nextInt(50) else 1 + rnd.nextInt(60)
      (lang, id, n)
    }
    val packed = PipelineQueries
      .packGreedy(docs.toDF("lang", "doc_id", "n_tok"), budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))

    val byPack = packed.groupBy(p => (p._1, p._4))
    byPack.foreach { case ((lang, pack), ds) =>
      val total = ds.map(_._3).sum
      withClue(s"$lang pack $pack: $ds") {
        (total <= budget || ds.length == 1) shouldBe true
      }
    }
    // sequential reference: replay the walk per lang in doc order
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      var pack = 0L; var fill = 0; var first = true
      ds.sortBy(_._2).foreach { case (_, id, n) =>
        if (first) { first = false; fill = n }
        else if (fill + n <= budget) fill += n
        else { pack += 1; fill = n }
        val got = packed.find(p => p._1 == lang && p._2 == id).get._4
        withClue(s"$lang doc $id") { got shouldBe pack }
      }
    }
  }

  test("packFirstFit matches the sequential reference, never overflows, and beats-or-ties next-fit") {
    val s = spark
    import s.implicits._
    val rnd = new Random(43)
    val budget = 100
    val docs = (1L to 1500L).map { id =>
      val lang = s"l${rnd.nextInt(4)}"
      val n = if (rnd.nextInt(20) == 0) budget + 1 + rnd.nextInt(50) else 1 + rnd.nextInt(60)
      (lang, id, n)
    }
    val packed = PipelineQueries
      .packFirstFit(docs.toDF("lang", "doc_id", "n_tok"), budget)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // no pack overfull except a solo oversize doc
    packed.groupBy(p => (p._1, p._4)).foreach { case ((lang, pack), ds) =>
      withClue(s"$lang pack $pack") {
        (ds.map(_._3).sum <= budget || ds.length == 1) shouldBe true
      }
    }
    // sequential reference replay per lang
    docs.groupBy(_._1).foreach { case (lang, ds) =>
      val fills = scala.collection.mutable.ArrayBuffer.empty[Int]
      ds.sortBy(_._2).foreach { case (_, id, n) =>
        val i = fills.indexWhere(_ + n <= budget)
        val expected = if (i >= 0) { fills(i) += n; i.toLong } else { fills += n; (fills.length - 1).toLong }
        val got = packed.find(p => p._1 == lang && p._2 == id).get._4
        withClue(s"$lang doc $id") { got shouldBe expected }
      }
      // first-fit never opens more packs than next-fit on the same walk
      val nextFitPacks = {
        var pack = 0L; var fill = 0; var first = true
        ds.sortBy(_._2).foreach { case (_, _, n) =>
          if (first) { first = false; fill = n }
          else if (fill + n <= budget) fill += n
          else { pack += 1; fill = n }
        }
        pack + 1
      }
      withClue(s"$lang pack counts") { fills.length.toLong should be <= nextFitPacks }
    }
  }

  test("packGreedy is exhaustive and deterministic across partitionings") {
    val s = spark
    import s.implicits._
    val docs = (1L to 500L).map(id => (s"l${id % 3}", id, 30 + (id % 50).toInt))
    val a = PipelineQueries.packGreedy(docs.toDF("lang", "doc_id", "n_tok"), 128)
    val b = PipelineQueries.packGreedy(
      docs.toDF("lang", "doc_id", "n_tok").repartition(17), 128)
    a.count() shouldBe 500
    a.exceptAll(b).count() shouldBe 0
    b.exceptAll(a).count() shouldBe 0
  }

  test("distributed sort + zipWithIndex ids match the global (n DESC, word) order") {
    val s = spark
    import s.implicits._
    val rnd = new Random(7)
    // heavy skew: zipf-ish counts so many ties exercise the tiebreaker
    val counts = (1 to 5000).map(i => (s"w$i", 1L + rnd.nextInt(1 + 2000 / i)))
    val ids = counts.toDF("word", "n")
      .repartition(13)
      .orderBy(desc("n"), col("word"))
      .rdd.zipWithIndex()
      .map { case (r, i) => (r.getString(0), r.getLong(1), i + 1) }
      .collect()
    val expected = counts.sortBy { case (w, n) => (-n, w) }
    ids.length shouldBe expected.length
    ids.zip(expected).foreach { case ((gw, gn, gid), (ew, en)) =>
      withClue(s"id $gid") { (gw, gn) shouldBe ((ew, en)) }
    }
    ids.map(_._3).toSeq shouldBe (1L to 5000L)
  }

  test("oriented wedge-join triangle count matches brute force on random graphs") {
    val s = spark
    import s.implicits._
    val rnd = new Random(11)
    (0 until 3).foreach { round =>
      val nodes = 40
      val edges = (for {
        a <- 1 to nodes; b <- (a + 1) to nodes
        if rnd.nextDouble() < 0.15
      } yield (a.toLong, b.toLong)).toSeq
      val edgeSet = edges.toSet
      val brute = (for {
        x <- 1 to nodes; y <- (x + 1) to nodes; z <- (y + 1) to nodes
        if edgeSet((x.toLong, y.toLong)) && edgeSet((y.toLong, z.toLong)) && edgeSet((x.toLong, z.toLong))
      } yield 1).size
      val got = GraphQueries.triangles(edges.toDF("a", "b")).count()
      withClue(s"round $round, ${edges.size} edges") { got shouldBe brute.toLong }
      // the degree-oriented enumeration counts the same triangles —
      // random graphs have plenty of equal-degree ties, exercising the
      // id tiebreak of the total order
      val oriented = GraphQueries.trianglesOriented(edges.toDF("a", "b")).count()
      withClue(s"round $round (oriented), ${edges.size} edges") { oriented shouldBe brute.toLong }
    }
  }

  test("degree orientation generates zero wedges at a hub (star graph)") {
    val s = spark
    import s.implicits._
    // star: hub 1 joined to 2..41. Under id orientation the hub fans out
    // C(40, 2) = 780 wedge pairs; under degree orientation every edge
    // points leaf->hub (deg 1 < deg 40), so out-degrees are all <= 1 and
    // the wedge join emits NOTHING — the property that keeps the join
    // linear on power-law graphs.
    val star = (2 to 41).map(b => (1L, b.toLong)).toDF("a", "b")
    val oe = GraphQueries.orientEdges(star)
    oe.where(col("src") === 1L).count() shouldBe 0L
    GraphQueries.orientedWedges(oe).count() shouldBe 0L
    GraphQueries.trianglesOriented(star).count() shouldBe 0L
  }
}
