package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

class WordShinglesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private val lambdaForm =
    """transform(sequence(0, size(w) - 3),
      |          i -> concat_ws(' ', element_at(w, i + 1),
      |                              element_at(w, i + 2),
      |                              element_at(w, i + 3)))""".stripMargin

  test("exact parity with the transform/concat_ws composition on the corpus") {
    GraftFunctions.register(spark)
    val diff = Tables.documents(spark, sf)
      .select(split(col("text"), " ").as("w"))
      .where(expr("size(w) >= 3"))
      .select(
        expr("word_shingles(w, 3)").as("native"),
        expr(lambdaForm).as("lambda"),
      )
      .where(expr("native != lambda"))
      .count()
    diff shouldBe 0L
  }

  test("edge semantics: short arrays, null elements, null array, width 1") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT word_shingles(array('a', 'b'), 3) AS short, " +
        "word_shingles(array('a', NULL, 'c'), 3) AS withNull, " +
        "word_shingles(CAST(NULL AS ARRAY<STRING>), 3) AS nullArr, " +
        "word_shingles(array('x', 'y'), 1) AS unigrams",
    ).collect().head
    r.getSeq[String](0) shouldBe Seq.empty // below width -> empty, no throw
    r.getSeq[String](1) shouldBe Seq("a c") // concat_ws skips nulls
    r.isNullAt(2) shouldBe true
    r.getSeq[String](3) shouldBe Seq("x", "y")
  }

  test("interpreted path matches codegen") {
    GraftFunctions.register(spark)
    // force the interpreted route through eval() by constructing the
    // expression directly over a literal
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val words = new GenericArrayData(Array[Any](
      UTF8String.fromString("a"), UTF8String.fromString("b"),
      UTF8String.fromString("c"), UTF8String.fromString("d"),
    ))
    val out = WordShingles(Literal(words, ArrayType(StringType)), 3)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    (0 until out.numElements()).map(out.getUTF8String(_).toString) shouldBe Seq("a b c", "b c d")
  }
}
