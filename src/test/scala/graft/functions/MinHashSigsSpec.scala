package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.scalatest.funsuite.AnyFunSuite

/** Pins the compiled [[MinHashSigs]] projection kernel against the
  * aggregate-column MinHash spelling it complements (r21: the
  * verify/containment/cross queries derive bands from their collect_set
  * aggregation instead of running a second corpus pass): same md5
  * 32-bit slice, same affine maps, same minima — and min's multiset
  * invariance means the DISTINCT-set signature equals the raw-stream
  * signature, which is the substitution's whole legality argument.
  */
class MinHashSigsSpec extends AnyFunSuite with graft.SparkSpec {

  import spark.implicits._

  private val as = (1 to 16).map(i => ((2654435761L * i) % 2147483648L) | 1L).toArray
  private val bs = (1 to 16).map(i => (2971215073L * i + 40503L * i * i) % 4294967296L).toArray

  private def sigsCol = ColumnBridge.column(
    MinHashSigs(ColumnBridge.expression(col("ss")), as, bs))

  test("set-derived sigs equal the aggregate-column minima over the raw stream") {
    val rnd = new scala.util.Random(99)
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    // raw shingle STREAM with forced duplicates (multiset != set)
    val raw = (1L to 120L).flatMap { doc =>
      val n = 3 + rnd.nextInt(12)
      val sh = (1 to n).map(_ => s"${words(rnd.nextInt(8))} ${words(rnd.nextInt(8))} ${words(rnd.nextInt(8))}")
      (sh ++ sh.take(3)).map(x => (doc, x)) // duplicates appended
    }
    val df = raw.toDF("doc_id", "sh")
      .withColumn("h", expr("CAST(conv(substring(md5(sh), 1, 8), 16, 10) AS BIGINT)"))
    val aggForm = df.groupBy("doc_id").agg(
      as.indices.map(i => min((col("h") * lit(as(i)) + lit(bs(i))) % lit(4294967296L)).as(s"mh$i")).head,
      as.indices.map(i => min((col("h") * lit(as(i)) + lit(bs(i))) % lit(4294967296L)).as(s"mh$i")).tail: _*,
    ).select(col("doc_id"), array(as.indices.map(i => col(s"mh$i")): _*).as("mh"))
    val setForm = df.groupBy("doc_id").agg(collect_set("sh").as("ss"))
      .select(col("doc_id"), sigsCol.as("mh"))
    val joined = aggForm.as("a").join(setForm.as("s"), "doc_id")
    assert(joined.where(not(col("a.mh") <=> col("s.mh"))).count() === 0L)
  }

  test("null elements are skipped; all-null or empty input yields NULL") {
    val df = Seq(
      (1L, Seq[String]("a b c", null)),
      (2L, Seq[String](null)),
      (3L, Seq.empty[String]),
    ).toDF("doc_id", "ss")
    val out = df.select(col("doc_id"), sigsCol.as("mh")).orderBy("doc_id")
      .as[(Long, Option[Seq[Long]])].collect()
    assert(out(0)._2.isDefined && out(0)._2.get.length === 16)
    assert(out(1)._2.isEmpty)
    assert(out(2)._2.isEmpty)
    // the non-null row's sigs equal the single-shingle affine values
    val md = java.security.MessageDigest.getInstance("MD5")
    val dig = md.digest("a b c".getBytes("UTF-8"))
    val h = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) | ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
    val expect = as.indices.map(i => (as(i) * h + bs(i)) % 4294967296L)
    assert(out(0)._2.get === expect)
  }
}
