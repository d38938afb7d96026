package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Pins try_to_int ≡ try_cast(s AS INT) over the edge-case set that
  * distinguishes the string→int cast dialects: signs, inner/outer
  * whitespace, decimal points, overflow at both Int boundaries, unicode
  * digits, hex/scientific notation, and junk. The whole point of the
  * expression is swapping the exception-driven TRY failure path for a
  * non-throwing parse — so any semantic divergence would be a silent
  * correctness change, and this spec makes it loud.
  */
class TryToIntSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val cases: Seq[String] = Seq(
    null, "", " ", "5", " 5 ", "+5", "-5", "05", "5.0", "5.9", "-5.9",
    ".5", "5.", "abc", "5abc", "2147483647", "2147483648", "-2147483648",
    "-2147483649", "\t5\n", " 5", "１２３", "0x10", "1e2", "+", "-",
    "5 5", "+-5", "--5", "0", "-0", "000000000000005", "999999999999999999999",
  )

  test("parity with try_cast over the edge-case set (codegen path)") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val rows = cases.toDF("s")
      .selectExpr("s", "try_to_int(s) AS native", "try_cast(s AS INT) AS builtin")
      .collect()
    rows.foreach { r =>
      withClue(s"input [${r.get(0)}]: ") { r.get(1) shouldBe r.get(2) }
    }
  }

  test("parity on the interpreted (non-codegen) path") {
    val bound = TryToInt(BoundReference(0, StringType, nullable = true))
    cases.filter(_ != null).foreach { c =>
      val interpreted = bound.eval(InternalRow(UTF8String.fromString(c)))
      val viaCast = org.apache.spark.sql.catalyst.expressions.TryEval(
        org.apache.spark.sql.catalyst.expressions.Cast(
          Literal(UTF8String.fromString(c), StringType),
          org.apache.spark.sql.types.IntegerType,
          evalMode = org.apache.spark.sql.catalyst.expressions.EvalMode.TRY,
        ),
      ).eval(InternalRow.empty)
      withClue(s"input [$c]: ") { interpreted shouldBe viaCast }
    }
  }

  test("non-throwing failure path is actually cheap on always-failing input") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    // not a benchmark assertion (CI noise), just a smoke that a full
    // column of failures completes and returns all nulls
    val n = spark.range(10000)
      .selectExpr("try_to_int(concat('x', CAST(id AS STRING))) AS v")
      .where("v IS NULL").count()
    n shouldBe 10000L
  }
}
