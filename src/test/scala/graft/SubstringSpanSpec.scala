package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The gram-fingerprint span dedup must be a pure re-keying: hashing
  * 5-grams to 60-bit fingerprints before the duplicate-detection shuffle
  * changes the bytes shuffled, never the spans found — identical output
  * to the string-keyed query whenever no fingerprint collides (the
  * fixture's gram count is far inside the 2^61 birthday bound, so here
  * "no collision" is a certainty, not a hope).
  */
class SubstringSpanSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fingerprint-keyed spans are identical to string-keyed spans on the fixture") {
    val str = SparkEntry.queries("dedup_substring_spans")(spark, sf)
      .collect().map(_.toString).toSeq
    val fp = SparkEntry.queries("dedup_substring_spans_fp")(spark, sf)
      .collect().map(_.toString).toSeq
    str.nonEmpty shouldBe true // the fixture genuinely contains duplicated 5-grams
    fp shouldBe str
  }
}
