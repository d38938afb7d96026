package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch ANN search: top-k neighbors for a SET of query vectors in one
  * job — the shape a production retrieval pipeline runs (kNN join),
  * generalizing the registered single-query demos (`similarity_topk`,
  * `ann_lsh_topk`, `ann_lsh_multiprobe`, `ann_ivf_topk`,
  * `ann_ivf_trained`), which AnnSearchSpec pins row-for-row against
  * these methods at their parameter points.
  *
  * Input corpus frame: `(vec_id: Long, label, v: Array[Double])` with
  * `cosine_similarity` registered (see SimilarityQueries.vecs). Queries
  * are corpus members named by id; all query-side frames are broadcast,
  * so the corpus scan never shuffles before the per-query top-k.
  *
  * The per-query top-k is `row_number` over `(qid)` filtered to `rn <=
  * k`, which Spark 4 plans as map-side `WindowGroupLimit` — each task
  * keeps only k rows per query before the single shuffle on qid. With B
  * queries per batch the shuffle carries at most `B * k * tasks` rows
  * regardless of corpus size: the 100-TB form.
  *
  * Tuning law the recall witness pins: LSH candidate sets NEST — fewer
  * hash bits and wider probing both grow the candidate set
  * monotonically (an 8-bit bucket refines a 3-bit one; a Hamming-1
  * probe ring at b bits is contained in the ring at b' < b bits), so
  * recall@k is monotone along both axes. Bits must track corpus size
  * (`bits ~ log2(N / targetBucketSize)`): the registered 8-bit scheme
  * is sized for millions of vectors, not the 500-vector fixture.
  */
object AnnSearch {

  private def cosine(a: String, b: String): Column = expr(s"cosine_similarity($a, $b)")

  /** Sign-LSH key over the first `bits` dims: '101…'-style string. */
  def bucketExpr(bits: Int, vcol: String = "v"): String =
    s"array_join(transform(slice($vcol, 1, $bits), x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"

  /** The query bucket plus its `bits` Hamming-1 neighbors. */
  def multiProbeExpr(bits: Int, bcol: String): String =
    s"""concat(array($bcol),
       |       transform(sequence(1, $bits), i ->
       |         concat(substring($bcol, 1, i - 1),
       |                CASE WHEN substring($bcol, i, 1) = '1' THEN '0' ELSE '1' END,
       |                substring($bcol, i + 1, $bits))))""".stripMargin

  /** Candidates `(qid, qv, vec_id, label, v)` -> per-query top-k
    * `(qid, vec_id, label, sim)`. The `rn <= k` filter over a
    * qid-partitioned window is the WindowGroupLimit map-side top-k.
    */
  private def rankPerQuery(cand: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("qid").orderBy(desc("sim"), col("vec_id"))
    cand
      .withColumn("sim", cosine("v", "qv"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("label"), col("sim"))
  }

  /** Exact brute-force kNN join: one corpus scan against a broadcast
    * query batch. The recall baseline every ANN variant is judged
    * against (its own recall is 1 by definition).
    */
  def exact(e: DataFrame, qids: Seq[Long], k: Int): DataFrame = {
    val q = broadcast(
      e.where(col("vec_id").isin(qids: _*)).select(col("vec_id").as("qid"), col("v").as("qv")),
    )
    rankPerQuery(e.crossJoin(q).where(col("vec_id") =!= col("qid")), k)
  }

  /** Sign-LSH blocked kNN join: candidates only from the query's bucket
    * (`multiProbe = true` adds its Hamming-1 ring). Bucket-bounded work,
    * never all-pairs.
    */
  def lsh(e: DataFrame, qids: Seq[Long], k: Int, bits: Int = 8, multiProbe: Boolean = false): DataFrame = {
    val b = e.withColumn("bucket", expr(bucketExpr(bits)))
    val qb = b
      .where(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("v").as("qv"), col("bucket").as("qbucket"))
    val probes = broadcast(
      if (multiProbe)
        qb.select(col("qid"), col("qv"), explode(expr(multiProbeExpr(bits, "qbucket"))).as("pbucket"))
      else qb.select(col("qid"), col("qv"), col("qbucket").as("pbucket")),
    )
    rankPerQuery(b.join(probes, col("bucket") === col("pbucket")).where(col("vec_id") =!= col("qid")), k)
  }

  /** IVF kNN join: corpus vectors 1..nCentroids seed the coarse
    * codebook (refined by `lloydIters` assign/recenter rounds — the
    * ann_ivf_trained recipe); every vector joins its nearest centroid's
    * inverted list; each query probes its `nprobe` nearest lists. The
    * codebook is always broadcast; assignment is one linear N*K pass.
    */
  def ivf(
      e: DataFrame,
      qids: Seq[Long],
      k: Int,
      nCentroids: Int = 16,
      nprobe: Int = 2,
      lloydIters: Int = 0,
  ): DataFrame = {
    def score(cents: DataFrame): DataFrame = {
      val w = Window.partitionBy("vec_id").orderBy(desc("acos"), col("cid"))
      e.crossJoin(broadcast(cents))
        .withColumn("acos", cosine("v", "cv"))
        .withColumn("arn", row_number().over(w))
    }
    def assign(cents: DataFrame): DataFrame = score(cents).where(col("arn") === 1)
    def recenter(assigned: DataFrame): DataFrame =
      assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg(avg("x").as("cav"))
        .groupBy("cid")
        .agg(expr("transform(sort_array(collect_list(struct(pos, cav))), p -> p.cav)").as("cv"))
    val seeds = e
      .where(col("vec_id").between(1, nCentroids))
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    val trained = (1 to lloydIters).foldLeft(seeds)((c, _) => recenter(assign(c)))
    val scored = score(trained)
    val members = scored.where(col("arn") === 1).select(col("vec_id"), col("label"), col("v"), col("cid"))
    val probes = broadcast(
      scored
        .where(col("vec_id").isin(qids: _*) && col("arn") <= nprobe)
        .select(col("vec_id").as("qid"), col("cid").as("pcid")),
    )
    val q = broadcast(
      e.where(col("vec_id").isin(qids: _*)).select(col("vec_id").as("qid2"), col("v").as("qv")),
    )
    rankPerQuery(
      members
        .join(probes, col("cid") === col("pcid"))
        .join(q, col("qid") === col("qid2"))
        .where(col("vec_id") =!= col("qid"))
        .drop("qid2", "pcid"),
      k,
    )
  }

  /** recall@k of `ann` against `ex` (both `(qid, vec_id, …)` top-k
    * frames): fraction of exact neighbors the ANN result found.
    */
  def recallAt(ex: DataFrame, ann: DataFrame, qids: Seq[Long], k: Int): Double = {
    val hits = ex.select("qid", "vec_id").join(ann.select("qid", "vec_id"), Seq("qid", "vec_id")).count()
    hits.toDouble / (qids.size.toLong * k)
  }
}
