package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled [[CharBigramCodes]] kernel against the regex
  * spelling it replaced in `text_langid_ngram` (r21 optimization), and
  * pins the long encoding's two load-bearing properties: injectivity
  * (bigram equality == code equality) and UTF8String-order preservation
  * (the profile tiebreak `ORDER BY n DESC, bg` is unchanged).
  */
class CharBigramCodesSpec extends AnyFunSuite with graft.SparkSpec {

  import spark.implicits._

  /** The exact regex form the query used before the kernel. */
  private val regexForm = "regexp_extract_all(txt, '(?=([\\\\s\\\\S][\\\\s\\\\S]))', 1)"

  private def decode(code: Long): String =
    new String(Character.toChars((code >> 21).toInt)) +
      new String(Character.toChars((code & 0x1FFFFF).toInt))

  private val fixtures = Seq(
    "",                      // no bigrams
    "a",                     // 1 char -> no bigrams
    "ab",                    // exactly one
    "hello world",           // plain ASCII
    "line one\nline two\n",  // newline bigrams ([\s\S], not `.`)
    "tab\tand  doubles",     // whitespace runs
    "héllo wörld çaça",      // non-ASCII BMP (2-byte UTF-8)
    "数据 处理 引擎",          // CJK BMP (3-byte UTF-8)
    "aaaa",                  // overlapping identical bigrams
  )

  test("codes decode to exactly the regex form's bigrams, in order") {
    GraftFunctions.register(spark)
    val df = fixtures.zipWithIndex.map { case (t, i) => (i, t) }.toDF("id", "txt")
    val rows = df.select(
      expr("char_bigram_codes(txt)").as("codes"),
      expr(regexForm).as("bgs"),
    ).as[(Seq[Long], Seq[String])].collect()
    assert(rows.length === fixtures.length)
    rows.foreach { case (codes, bgs) =>
      assert(codes.map(decode) === bgs)
    }
  }

  test("supplementary characters: one bigram per adjacent code-point pair") {
    GraftFunctions.register(spark)
    // U+1F600 (surrogate pair in UTF-16) between ASCII chars: the kernel
    // walks CODE POINTS, so "a<emoji>b" has bigrams (a,emoji), (emoji,b)
    // — the Java-9+ zero-width-regex behaviour (and DuckDB substr
    // semantics).
    val cp = 0x1F600
    val s = "a" + new String(Character.toChars(cp)) + "b"
    val codes = Seq(Tuple1(s)).toDF("txt")
      .select(expr("char_bigram_codes(txt)").as("c")).as[Seq[Long]].head()
    assert(codes === Seq(('a'.toLong << 21) | cp, (cp.toLong << 21) | 'b'.toLong))
  }

  test("encoding preserves UTF8String binary order of the bigram strings") {
    GraftFunctions.register(spark)
    // every adjacent pair drawn from a cross-section of 1-, 2- and
    // 3-byte UTF-8 code points; sorting by code must equal sorting by
    // the bigram STRING (Spark string order = UTF8 binary order)
    val chars = Seq('a', 'z', '\n', ' ', 'é', 'ß', '中', '\uE000', '\uFFFD')
    val bigrams = (for (x <- chars; y <- chars) yield s"$x$y").distinct
    val df = bigrams.toDF("bg")
      .select(col("bg"), expr("element_at(char_bigram_codes(bg), 1)").as("code"))
    val byStr = df.orderBy("bg").select("code").as[Long].collect().toSeq
    val byCode = df.orderBy("code").select("code").as[Long].collect().toSeq
    assert(byStr === byCode)
    // injectivity over the same set
    assert(byCode.distinct.size === bigrams.size)
  }
}
