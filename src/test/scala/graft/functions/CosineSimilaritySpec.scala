package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.{SparkSpec, Tables}

class CosineSimilaritySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def vecs = {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
  }

  test("bit-exact parity with the zip_with + fold composition") {
    def foldDot(x: String, y: String) =
      s"aggregate(zip_with($x, $y, (p, q) -> p * q), 0.0D, (acc, v) -> acc + v)"
    val foldCos = s"${foldDot("a.v", "b.v")} / (sqrt(${foldDot("a.v", "a.v")}) * sqrt(${foldDot("b.v", "b.v")}))"
    val pairs = vecs.as("a").crossJoin(vecs.limit(20).as("b"))
    val diff = pairs
      .select(
        expr("cosine_similarity(a.v, b.v)").as("native"),
        expr(foldCos).as("folded"),
      )
      .where(col("native") =!= col("folded")) // bitwise: any ulp diff fails
      .count()
    diff shouldBe 0L
  }

  test("null and interpreted-mode behavior") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS same, " +
        "cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS orth, " +
        "cosine_similarity(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS n",
    ).collect().head
    row.getDouble(0) shouldBe 1.0
    row.getDouble(1) shouldBe 0.0
    row.isNullAt(2) shouldBe true
  }

  test("null elements and ragged lengths yield NULL, matching the fold form") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      "SELECT cosine_similarity(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 2.0D)) AS nul_elem, " +
        "cosine_similarity(array(1.0D), array(1.0D, 2.0D)) AS ragged, " +
        "aggregate(zip_with(array(1.0D), array(1.0D, 2.0D), (p, q) -> p * q), 0.0D, (a, v) -> a + v) AS fold_ragged",
    ).collect().head
    row.isNullAt(0) shouldBe true
    row.isNullAt(1) shouldBe true
    row.isNullAt(2) shouldBe true // the fold form agrees
  }

  test("implicit cast accepts float arrays directly") {
    GraftFunctions.register(spark)
    val c = Tables.embeddings(spark, sf)
      .selectExpr("cosine_similarity(embedding, embedding) AS self")
      .collect()
    all(c.map(_.getDouble(0))) shouldBe 1.0 +- 1e-9
  }

  test("stays inside WholeStageCodegen") {
    // (cross-join shapes fall back to BroadcastNestedLoopJoin, which
    // never codegens — the projection is where the expression lives)
    val plan = vecs.selectExpr("cosine_similarity(v, v) AS s")
      .queryExecution.executedPlan.toString
    // codegen'd operators print as "*(stage) Operator" in the plan string
    plan should include regex """\*\(\d+\) Project \[cosine_similarity"""
  }

  test("extension injection applies and interpreted eval works") {
    // A second SparkContext can't coexist with the shared test session,
    // so exercise the extension object and the non-codegen path directly.
    noException should be thrownBy
      new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val a = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType))
    val b = Literal.create(Seq(1.0, 2.0, 3.0), ArrayType(DoubleType))
    CosineSimilarity(a, b).eval(null).asInstanceOf[Double] shouldBe 1.0 +- 1e-12
  }
}
