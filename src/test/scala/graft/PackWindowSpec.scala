package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.PipelineQueries

/** Bounded-window first-fit (the 100-TB dial for pack assignment):
  * equal to pure first-fit whenever no stratum ever has more than
  * `window` packs, and always budget-sound regardless.
  */
class PackWindowSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def docsDF(rows: Seq[(String, Long, Int)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("lang", "doc_id", "n_tok")
  }

  private def collectAssign(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Long] = {
    val s = spark
    import s.implicits._
    df.select("lang", "doc_id", "pack_id").as[(String, Long, Long)]
      .collect().map { case (l, id, p) => (l, id) -> p }.toMap
  }

  test("windowed == pure first-fit whenever pack counts stay under the window (randomized, seeded)") {
    val rnd = new scala.util.Random(20260813L)
    val budget = 100
    (1 to 5).foreach { _ =>
      // sizes biased large so packs fill fast but total packs per lang
      // stays well under a generous window
      val rows = for {
        lang <- Seq("en", "fr")
        id <- 1L to 60L
      } yield (lang, id, 10 + rnd.nextInt(60))
      val pure = collectAssign(PipelineQueries.packFirstFit(docsDF(rows), budget))
      val maxPacks = pure.groupBy(_._1._1).map { case (_, m) => m.values.max + 1 }.max
      val windowed =
        collectAssign(PipelineQueries.packFirstFitWindowed(docsDF(rows), budget, window = maxPacks.toInt))
      windowed shouldBe pure
    }
  }

  test("window=1 degenerates exactly to next-fit (packGreedy) on randomized inputs") {
    // The family is consistent at its extremes: an unbounded window is
    // pure first-fit (test above); a single-pack window can only look
    // at the newest pack — which IS next-fit.
    val rnd = new scala.util.Random(99L)
    val budget = 100
    (1 to 3).foreach { _ =>
      val rows = for { lang <- Seq("en", "de"); id <- 1L to 80L }
        yield (lang, id, 5 + rnd.nextInt(120)) // some docs exceed the budget
      val nextFit = collectAssign(PipelineQueries.packGreedy(docsDF(rows), budget))
      val windowed1 = collectAssign(PipelineQueries.packFirstFitWindowed(docsDF(rows), budget, window = 1))
      windowed1 shouldBe nextFit
    }
  }

  test("a tight window retires packs but never overfills the budget, and ids stay dense") {
    val rnd = new scala.util.Random(7L)
    val budget = 100
    val rows = (1L to 200L).map(id => ("en", id, 10 + rnd.nextInt(60)))
    val out = PipelineQueries.packFirstFitWindowed(docsDF(rows), budget, window = 2)
    val s = spark
    import s.implicits._
    val packs = out.groupBy("lang", "pack_id").agg(sum("n_tok").as("fill"))
      .as[(String, Long, Long)].collect()
    all(packs.map(_._3)) should be <= budget.toLong
    // creation-order ids: 0..max with no holes
    val ids = packs.map(_._2).sorted
    ids shouldBe (0L until ids.length.toLong).toArray
    // the window genuinely binds on this input: STRICTLY more packs than
    // pure first-fit proves at least one fitting pack was retired by the
    // window (>= would be vacuous — windowed can never open fewer)
    val pureCount = collectAssign(PipelineQueries.packFirstFit(docsDF(rows), budget)).values.max + 1
    ids.length.toLong should be > pureCount
  }
}
