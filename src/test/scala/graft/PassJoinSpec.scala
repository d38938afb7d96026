package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.queries.PipelineQueries

/** PassJoin blocking losslessness: the segment-blocked pair set must
  * EQUAL the naive all-pairs `levenshtein <= 2` set — not just on the
  * fixture the oracle gate checks, but on the adversarial shapes that
  * break naive blocking schemes (front insertions shift every position;
  * edits spanning segment boundaries touch two segments at once; length
  * drift of exactly the threshold).
  */
class PassJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def naive(df: DataFrame): Set[(Long, Long, Int)] = {
    val p = df.select(col("k"), col("n"))
    p.as("a").join(p.as("b"), col("a.k") < col("b.k"))
      .select(
        col("a.k").as("key_a"), col("b.k").as("key_b"),
        levenshtein(col("a.n"), col("b.n")).cast("int").as("dist"),
      )
      .where(col("dist") <= 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  private def blocked(df: DataFrame): Set[(Long, Long, Int)] =
    PipelineQueries.passjoinPairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  private def toDf(strings: Seq[String]): DataFrame = {
    val s = spark
    import s.implicits._
    strings.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("k", "n")
  }

  test("adversarial shapes: shifts, boundary edits, length drift, duplicates") {
    val base = "abcdefghij"
    val cases = Seq(
      base,
      "XX" + base.drop(2),        // 2 substitutions at the front
      base.drop(2),               // 2 front deletions: every position shifts left
      "XY" + base,                // 2 front insertions: every position shifts right
      base.take(3) + "Z" + base.drop(4),  // substitution at a segment boundary
      base.take(2) + base.drop(4),        // deletion spanning the 1st/2nd segment seam
      base.reverse,               // far pair: must NOT appear
      base,                       // exact duplicate: dist 0
      base.take(9) + "Z" + "Q",   // substitution + append (dist 2, length drift 1)
      "mnopqrstuv",               // disjoint alphabet: must NOT pair with base family
      "mnopqrstXv",               // ...but pairs with its own neighbor
    )
    val df = toDf(cases)
    val expected = naive(df)
    withClue(s"expected=$expected") { blocked(df) shouldBe expected }
    // sanity on the fixture of this test itself: the adversarial family
    // really does contain pairs at dist 0, 1 and 2, and true negatives
    expected.map(_._3) should contain allOf (0, 2)
    expected.size should be < (cases.size * (cases.size - 1)) / 2
  }

  test("randomized equivalence over a small alphabet (seeded)") {
    val rnd = new scala.util.Random(20260812L)
    val alpha = "abc" // tiny alphabet maximizes accidental near-pairs
    (1 to 3).foreach { _ =>
      val strings = Seq.fill(40)((3 + rnd.nextInt(8)).toString.toInt match {
        case len => (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      })
      val df = toDf(strings)
      blocked(df) shouldBe naive(df)
    }
  }

  test("minimum length 3 strings are handled; every segment non-empty") {
    val df = toDf(Seq("abc", "abd", "xbc", "abcd", "ab" + "cde"))
    blocked(df) shouldBe naive(df)
  }
}
