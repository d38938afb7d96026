package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Spark 4 SQL-defined functions (CREATE TEMPORARY FUNCTION ... RETURN):
  * the declarative UDF surface — the body is a SQL expression Catalyst
  * inlines into the calling plan, so unlike a Scala closure it stays
  * inside codegen and the optimizer sees through it (pushdown, folding).
  */
class SqlUdfSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a scalar SQL UDF inlines into the plan and matches the inline expression") {
    val s = spark
    import s.implicits._
    s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_toks(t STRING) RETURNS INT RETURN size(split(t, ' '))")
    try {
      Tables.documents(s, sf).createOrReplaceTempView("docs_udf")
      val viaUdf = s.sql("SELECT doc_id, graft_toks(text) AS n FROM docs_udf ORDER BY doc_id")
        .as[(Long, Int)].collect()
      val inline = Tables.documents(s, sf)
        .select(col("doc_id"), expr("size(split(text, ' '))").as("n"))
        .orderBy("doc_id").as[(Long, Int)].collect()
      viaUdf shouldBe inline
      // the body really inlined: no UDF/eval node in the physical plan
      val plan = s.sql("SELECT graft_toks(text) FROM docs_udf").queryExecution.executedPlan.toString
      (plan should not).include("BatchEvalPython")
      (plan should not).include("ScalaUDF")
    } finally {
      s.catalog.dropTempView("docs_udf")
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS graft_toks")
      ()
    }
  }

  test("a table-valued SQL UDF parameterizes a subquery over a real table") {
    val s = spark
    import s.implicits._
    Tables.documents(s, sf).createOrReplaceTempView("docs_tvf")
    s.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION graft_docs_of(l STRING)
        |RETURNS TABLE(doc_id BIGINT)
        |RETURN SELECT doc_id FROM docs_tvf WHERE lang = l""".stripMargin,
    )
    try {
      val viaTvf = s.sql("SELECT doc_id FROM graft_docs_of('en') ORDER BY doc_id").as[Long].collect()
      val direct = Tables.documents(s, sf).where(col("lang") === "en")
        .select("doc_id").orderBy("doc_id").as[Long].collect()
      viaTvf shouldBe direct
      direct should not be empty
    } finally {
      s.sql("DROP TEMPORARY FUNCTION IF EXISTS graft_docs_of")
      s.catalog.dropTempView("docs_tvf")
      ()
    }
  }
}
